"""Block/grid sizing policy for Pallas kernels.

TPU analog of the reference's Metal threadgroup chooser
(`csrc/primitives/metal_utils.h:53-100`): pick block sizes that respect the
(8, 128) f32 tile, keep per-program VMEM under budget, and give the MXU
enough rows.
"""

from __future__ import annotations

SUBLANE = 8
LANE = 128
VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under ~16 MB/core


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def cdiv(a: int, b: int) -> int:
    # (shared definition; ops/_frames.py re-exports the same helper)
    return -(-a // b)


#: radices C = n_fft/hop and R2 = hop/128 for the fused radix-DFT kernels
MAX_RADIX = 8


def radix_shape_ok(n_fft: int, hop_length: int) -> bool:
    """Shared shape gate for the radix-decimated DFT kernels (fused mel /
    STFT / ISTFT): pow2 ``n_fft = C*hop``, ``hop = R2*128``, radices
    ``C, R2 <= MAX_RADIX``. Each kernel adds its own VMEM-budget check."""
    return (
        n_fft >= LANE
        and n_fft & (n_fft - 1) == 0
        and hop_length >= LANE
        and hop_length % LANE == 0
        and n_fft % hop_length == 0
        and n_fft // hop_length <= MAX_RADIX
        and hop_length // LANE <= MAX_RADIX
    )
