# Convenience targets (counterpart of the reference's GNU make build;
# there is nothing to compile except the optional native extension).

.PHONY: all native check bench clean

all: native

native:
	python native/setup.py build_ext --inplace

check:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -rf build smallk_tpu/native/_native*.so
	find . -name __pycache__ -type d -exec rm -rf {} +
