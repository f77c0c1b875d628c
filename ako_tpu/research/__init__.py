"""Research prototypes — NOT part of the codec pipeline.

The analog of the reference's resources/research/ directory: clean,
scalar reference models used to derive and cross-check the production
kernels (scalar_model), and a standalone rANS coder (rans) — the
groundwork for the format's reserved-but-unimplemented MANBAVARAN
compression method (reference library/ako.h:71, compression.c:39)."""
