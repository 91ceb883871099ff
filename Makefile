# tpuir — convenience targets (CLI parity with the reference Makefile)

.PHONY: test test-monolithic bench download-weights download-datasets native demo flops clean

# The gate: chunked runner (fresh process per chunk, persistent compile
# cache) — a monolithic 40-min pytest process has segfaulted inside
# XLA:CPU compiles; see scripts/run_tests.py.
test:
	python scripts/run_tests.py

test-monolithic:
	python -m pytest tests/ -q

bench:
	python bench.py

download-weights:
	python scripts/download.py weights

download-datasets:
	python scripts/download.py datasets

native:
	g++ -O3 -shared -fPIC native/tileblend.cpp -o native/libtileblend.so

demo:
	python scripts/demo.py

flops:
	python scripts/compute_flops.py

eval:
	python scripts/tests.py

clean:
	rm -f native/libtileblend.so
	rm -rf results experiments tb_logger
