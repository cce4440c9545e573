"""Global numerical / policy constants for mlx-audio-primitives-tpu.

The reference library keeps configuration as module constants plus
librosa-compatible keyword arguments (reference: SURVEY.md §5.6;
`mlx_audio_primitives/stft.py:21-24`). We follow the same philosophy: one
small module of constants, no flag registry.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# Epsilon added to the squared-window envelope denominator in overlap-add
# normalization (reference: `mlx_audio_primitives/stft.py:21`).
WINDOW_SUM_EPSILON: float = 1e-8

# Table-cache sizes (reference: stft.py:24, windows.py:138, mel.py:100,
# mfcc.py:23 use 32/128/64/32 respectively).
WINDOW_CACHE_SIZE: int = 128
PADDED_WINDOW_CACHE_SIZE: int = 32
FILTERBANK_CACHE_SIZE: int = 64
DCT_CACHE_SIZE: int = 32

# Default real dtype for all device computation. Tables are built in float64
# on the host and cast to this dtype before being placed on device.
REAL_DTYPE = jnp.float32
COMPLEX_DTYPE = jnp.complex64

# Matmul precision for accuracy-critical contractions (mel filterbank, DCT
# basis, DFT-matmul STFT). On TPU the MXU natively multiplies bfloat16;
# HIGHEST requests the multi-pass f32 emulation needed to hit the reference's
# ~1e-4..5e-5 parity tolerances (SURVEY.md §7 "Hard parts" #1).
MATMUL_PRECISION = lax.Precision.HIGHEST

# Fused mel kernel GEMM mode: True = 3-pass bf16-split contractions (each
# f32 operand split hi/lo into two bfloat16 planes; hi@hi + hi@lo + lo@hi on
# the native-bf16 MXU — the same scheme lax.Precision.HIGH uses, which Mosaic
# does not expose inside Pallas). Measured on v5e: ~2x the HIGHEST-precision
# kernel at 2.7e-5 max relative error vs the f64 oracle — the same accuracy
# class as the XLA six-step fallback pipeline (2.4e-5) this kernel replaces,
# and 10x inside the reference's ~1e-4 mel/MFCC parity bar (reference
# `README.md:436-438`). Reconstruction paths (STFT/ISTFT round-trip <=1e-5),
# pitch (calibrated ACF noise floors), and spectral_flatness (log-power
# geometric mean reads the near-silent bins' noise floor) always use HIGHEST
# regardless.
ANALYSIS_FAST_GEMM: bool = True

# STFT sizes at or below this threshold are sensible for the DFT-as-matmul
# path (fft_mode='matmul'). Benchmarked on v5e: XLA's FFT wins at the default
# HIGHEST matmul precision, the GEMM wins at HIGH/DEFAULT; 'auto' uses FFT.
DFT_MATMUL_MAX_NFFT: int = 4096
