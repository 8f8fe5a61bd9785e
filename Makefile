# Build the native runtime libraries + run the test suite.
#
# The reference's Makefile compiles one benchmark binary per (arch × format ×
# params) configuration (/root/reference/Makefile:10-21); here XLA recompilation
# replaces that, and the only ahead-of-time builds are the native host-runtime
# libraries (they also self-build on first import).

CXX ?= g++
CXXFLAGS ?= -O3 -shared -fPIC -std=c++17

NATIVE_DIR := singlespmv_tpu/core/native
LIBS := $(NATIVE_DIR)/_mmio.so $(NATIVE_DIR)/_logfmt.so \
        $(NATIVE_DIR)/_sort.so $(NATIVE_DIR)/_scatter.so

.PHONY: all native test bench clean

all: native

native: $(LIBS)

$(NATIVE_DIR)/_mmio.so: $(NATIVE_DIR)/mmio_native.cpp
	$(CXX) $(CXXFLAGS) $< -o $@

$(NATIVE_DIR)/_logfmt.so: $(NATIVE_DIR)/logfmt_native.cpp
	$(CXX) $(CXXFLAGS) $< -o $@

$(NATIVE_DIR)/_sort.so: $(NATIVE_DIR)/sort_native.cpp
	$(CXX) $(CXXFLAGS) $< -o $@

$(NATIVE_DIR)/_scatter.so: $(NATIVE_DIR)/scatter_native.cpp
	$(CXX) $(CXXFLAGS) $< -o $@

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

clean:
	rm -f $(NATIVE_DIR)/*.so $(NATIVE_DIR)/*.so.tmp
