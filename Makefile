# Development entry points (lint tools are optional in this image; the
# contract linters under scripts/ always run as part of the test suite).
#
# Test economics (reference Makefile gates at COV_THRESHOLD=90 with a
# fast/slow split in .github/workflows/ci.yml):
#   make test     — default suite, slow-marked tests excluded (~5-6 min)
#   make test-full — everything, including the >15 s lockstep/pipeline tests
#   make ci       — contracts + default suite (the pre-commit loop)
#   make ci-full  — contracts + full suite under the line-coverage gate
#                   (sys.monitoring covgate, threshold below)

# full-suite gate at the reference's own bar (reference Makefile
# COV_THRESHOLD=90; measured 92.0% round 4, round-5 tree adds tests); the
# default suite gates lower because slow-marked integration tests cover
# the deep paths (measured ~82%)
COV_THRESHOLD ?= 90
COV_FAST_THRESHOLD ?= 80

.PHONY: test test-full fast-test contracts bench ci ci-full

test:
	FARKLE_COV_THRESHOLD=$(COV_FAST_THRESHOLD) \
	FARKLE_COV_OUT=results/coverage_fast.json \
	python -m pytest tests/ -q -m "not slow"

test-full:
	FARKLE_COV_THRESHOLD=$(COV_THRESHOLD) \
	FARKLE_COV_OUT=results/coverage_full.json \
	python -m pytest tests/ -q

fast-test:
	python -m pytest tests/unit -q -m "not slow"

contracts:
	python scripts/check_rng_contract.py
	python scripts/check_terminology.py
	python scripts/check_structure_release.py
	python -m compileall -q farkle_ii_tpu scripts
	python scripts/check_unused_imports.py

bench:
	python bench.py

ci: contracts test

ci-full: contracts test-full
