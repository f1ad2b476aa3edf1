# Common targets for the adfmsl framework
.PHONY: install native test bench verify-config warm

install:
	pip install -e . --no-build-isolation --no-deps

native:
	$(MAKE) -C adfmsl/io_native/src

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

# one-time after a host re-image: compile the driver-critical programs into
# the persistent XLA cache (~/.cache/adfmsl_xla) so the driver's timed bench
# window never pays the multi-minute cold remote compile (CLAUDE.md)
warm:
	python scripts/warm_cache.py

verify-config:
	python -c "from adfmsl.config import verify_all; print(verify_all().summary())"
