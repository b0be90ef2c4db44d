"""Device compute ops (jnp reference paths + Pallas kernels).

Each op module carries a pure-jnp implementation (the correctness oracle twin,
mirroring the reference's paired GPU/CPU matchers —
src/GPUStereoProcessor.cpp:18-38) and, where hot, a fused Pallas kernel.
"""
