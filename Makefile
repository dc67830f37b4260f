# Developer workflow targets (tooling parity with the reference's Makefile).

PYTHON ?= python

.PHONY: install test bench docs format clean

install:
	$(PYTHON) -m pip install -e . --no-deps --no-build-isolation

test:
	$(PYTHON) -m pytest tests/ -q

test-fast:
	$(PYTHON) -m pytest tests/ -q -x --ignore=tests/test_physics.py

bench:
	$(PYTHON) bench.py

docs:
	$(PYTHON) scripts/build_docs.py

format:
	$(PYTHON) -m black bodge_tpu tests bench.py __graft_entry__.py 2>/dev/null || true

clean:
	rm -rf build dist *.egg-info .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
