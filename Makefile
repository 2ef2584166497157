# Convenience targets; `make ci` reproduces .github/workflows/ci.yml locally
# (this sandbox cannot execute GitHub Actions — see scripts/ci.sh).
.PHONY: ci ci-fast test test-full bench native

native: native/libf63.so native/fp2_count

native/libf63.so: native/f63.c native/air_eval.c native/ntt.c native/deep_compose.c native/rescue_tables.h
	scripts/build_native.sh

native/fp2_count: native/fp2_count.c
	gcc -O3 -march=native -fopenmp -o native/fp2_count native/fp2_count.c

ci:
	scripts/ci.sh

ci-fast:
	scripts/ci.sh --fast

test:
	JAX_PLATFORMS=cpu python -m pytest tests/ -q

test-full:
	JAX_PLATFORMS=cpu python -m pytest tests/ -q -m ""


bench:
	python bench.py
