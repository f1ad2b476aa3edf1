# Common targets for the adfmsl framework
.PHONY: install native test bench verify-config

install:
	pip install -e . --no-build-isolation --no-deps

native:
	$(MAKE) -C adfmsl/io_native/src

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

verify-config:
	python -c "from adfmsl.config import verify_all; print(verify_all().summary())"
