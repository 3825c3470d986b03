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

bench:
	python bench.py

ci: contracts test
