# tpcg top-level targets. (The reference's top Makefile lists source files
# that don't exist — Makefile:4 vs the actual tree; this one is exercised.)

.PHONY: all native test bench clean

all: native

native:
	$(MAKE) -C csrc

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	$(MAKE) -C csrc clean
	rm -rf .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
	# .jax_cache is tracked (warm bench) — not removed here
