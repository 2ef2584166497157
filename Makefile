# Convenience targets; `make ci` reproduces .github/workflows/ci.yml locally
# (this sandbox cannot execute GitHub Actions — see scripts/ci.sh).
.PHONY: ci ci-fast test bench

ci:
	scripts/ci.sh

ci-fast:
	scripts/ci.sh --fast

test:
	JAX_PLATFORMS=cpu python -m pytest tests/ -q

bench:
	python bench.py
