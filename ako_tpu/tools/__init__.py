"""Host-side CLI tools: akoenc / akodec equivalents, options registry,
events/benchmark harness (rebuilt from the behavior of
reference tools/akoenc.cpp, tools/akodec.cpp, tools/options.hpp,
tools/benchmark.hpp; PNG I/O via Pillow instead of vendored lodepng)."""
