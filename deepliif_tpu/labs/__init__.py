"""Experimental / measured-negative-result modules — NOT the product path.

Everything here is working, parity-tested code that LOST to the default XLA
path in end-to-end measurement on v5e (numbers in docs/Performance.md) and is
kept only as a reproducible record:

  fused_stages  — fully-fused Pallas stage chain for the resnet generator
                  (conv3x3 s2 + stats, phase-decomposed transposed conv,
                  fused tails). Gated behind DEEPLIIF_FUSE_STAGES=1; loses
                  at ensemble level to XLA + fused resblocks + s2d tails
                  (53.8 vs 59.3 tiles/s, batch 48) due to pallas_call
                  boundary relayouts.
  grouped       — feature-grouped ensemble execution ((B,H,W,N*C) activations
                  with feature_group_count=N instead of vmap over nets).
                  Reachable only from tests; measured no win on v5e.
  phases        — sub-pixel phase decomposition of stride-2 transposed conv
                  (4x fewer MACs, 19% slower end-to-end: the phase
                  interleave is a full-tensor HBM shuffle).

Package LoC outside labs/ ≈ product LoC; nothing in deepliif_tpu imports
labs except behind explicit experiment gates.
"""
