# Build/test gate — counterpart of the reference's top-level Makefile +
# test/test.mk `make test` harness (the package itself is pure Python +
# lazily compiled C++ ctypes libs, so "build" = compile the native libs).

PY ?= python

.PHONY: all test test-quick bench native clean

all: native

native:
	$(PY) -c "from gardenia_tpu import native; \
	  print('parser:', native.available(), \
	        'builder:', native.builder_available())"

# full gate: native libs + pytest suite (CPU, virtual 8-device mesh)
test: native
	$(PY) -m pytest tests/ -q

test-quick: native
	$(PY) -m pytest tests/ -q -x -k "not parallel and not reference"

# whole-surface regression (serial-oracle PASS per kernel; add
# --device cpu off-TPU)
run:
	$(PY) run.py

bench:
	$(PY) bench.py --quick

clean:
	rm -f gardenia_tpu/native/*.so
