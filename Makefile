# Development entry points (lint tools are optional in this image; the
# contract linters under scripts/ always run as part of the test suite).

.PHONY: test fast-test contracts bench ci

test:
	python -m pytest tests/ -q

fast-test:
	python -m pytest tests/unit -q

contracts:
	python scripts/check_rng_contract.py
	python scripts/check_terminology.py
	python scripts/check_structure_release.py
	python -m compileall -q farkle_ii_tpu scripts
	python scripts/check_unused_imports.py

bench:
	python bench.py

ci: contracts test
