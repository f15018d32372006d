# Developer convenience targets, mirroring the reference's Makefile
# (/root/reference/Makefile: default dev / install / ops / clean).

.PHONY: default
default: dev

.PHONY: install
install:
	python -m pip install . --no-build-isolation

.PHONY: dev
dev:
	python -m pip install -e . --no-build-isolation

# Build just the native host kernels in place (the reference's `make ops`
# builds its Caffe2 custom-op library; here it is the C++ box/RoIPool libs).
.PHONY: ops
ops:
	$(MAKE) -C native

.PHONY: test
test:
	python -m pytest tests/ -x -q

.PHONY: clean
clean:
	$(MAKE) -C native clean
	rm -rf build dist *.egg-info
