# Developer workflows. Tests force the CPU platform themselves
# (tests/conftest.py); TPU targets use the local chip.

PY ?= python

.PHONY: test test-fast test-tpu bench ladder native clean round

test:            ## full CPU suite (8 virtual devices)
	$(PY) -m pytest tests/ -q

test-fast:       ## skip slow end-to-end tests
	$(PY) -m pytest tests/ -q -m "not slow"

test-tpu:        ## compiled-kernel + integration suite on the real chip
	CL_TPU_TESTS=1 $(PY) -m pytest tests/tpu/ -q

bench:           ## headline images/sec/chip JSON line
	$(PY) bench.py

ladder:          ## acceptance ladder vs the torch oracle (quick shapes)
	$(PY) benchmarks/run.py --quick --torch

round:           ## per-round gate: CPU suite, then the on-chip suite
	             ## (recorded to benchmarks/tpu_suite_last.txt), then bench.
	             ## Run benchmarks ALONE — host contention skews chip numbers.
	$(PY) -m pytest tests/ -q
	CL_TPU_TESTS=1 $(PY) -m pytest tests/tpu/ -q 2>&1 | tee benchmarks/tpu_suite_last.txt
	$(PY) bench.py

native:          ## (re)build the C++ host rasterizer
	rm -rf cl_tpu/native/_build && $(PY) -c "from cl_tpu import native; assert native.available(), native.load_error()"

clean:
	rm -rf cl_tpu/native/_build .pytest_cache
