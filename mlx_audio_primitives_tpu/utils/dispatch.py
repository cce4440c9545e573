"""Backend detection and fast-path dispatch policy.

The reference library ships an optional C++/Metal extension and checks
``HAS_CPP_EXT`` before every fast-path call, with a pure-Python fallback that
keeps the whole suite green without the native build (reference:
`mlx_audio_primitives/_extension.py:30-44`, `ARCHITECTURE.md:392-408`).

The TPU-native analog: Pallas-TPU kernels are the fast path, pure-XLA (jnp)
compositions are the always-available reference path. ``HAS_PALLAS_TPU`` plays
the role of ``HAS_CPP_EXT``; per-op ``use_pallas=`` kwargs play the role of the
reference's ``use_cpp=`` overrides (`features.py:286`, `framing.py:199`).
"""

from __future__ import annotations

import os

import jax


def default_backend() -> str:
    return jax.default_backend()


def is_tpu() -> bool:
    return default_backend() == "tpu"


def _pallas_available() -> bool:
    if os.environ.get("MLX_AUDIO_TPU_DISABLE_PALLAS", "0") == "1":
        return False
    try:
        from jax.experimental import pallas  # noqa: F401
    except Exception:  # pragma: no cover - pallas ships with jax
        return False
    return True


#: True when Pallas kernels can run at all (interpret mode on CPU is used by
#: the equivalence test suite, the analog of `tests/test_cpp_extension.py`).
HAS_PALLAS: bool = _pallas_available()


def has_pallas_tpu() -> bool:
    """True when compiled (non-interpret) Pallas TPU kernels can run.

    Computed LAZILY — ``jax.default_backend()`` initializes the XLA backend,
    and doing that at import time would break programs that must call
    ``jax.distributed.initialize()`` (or set the platform) after importing
    this library. First use happens inside an op call, where the backend is
    being initialized anyway.
    """
    return is_tpu() and HAS_PALLAS


def __getattr__(name: str):  # pragma: no cover - thin back-compat shim
    # HAS_PALLAS_TPU used to be a module constant; keep the name importable
    # without paying the import-time backend initialization.
    if name == "HAS_PALLAS_TPU":
        return has_pallas_tpu()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def resolve_use_pallas(flag: bool | None, default_on_tpu: bool = False) -> bool:
    """Resolve a per-op ``use_pallas`` kwarg against availability.

    ``True`` selects the kernel whenever Pallas is available (interpret mode
    off-TPU); ``False`` always selects the pure-XLA path. ``None`` defers to
    the per-op measured-winner policy: ops whose kernel benchmarks faster
    than their XLA path on real TPUs pass ``default_on_tpu=True`` and get the
    kernel automatically on TPU (never in CPU interpret mode, which exists
    for testing only). Honors the MLX_AUDIO_TPU_DISABLE_PALLAS kill switch.
    """
    if flag is True:
        return HAS_PALLAS
    if flag is None and default_on_tpu:
        return has_pallas_tpu()
    return False


def is_batch_traced(*arrays) -> bool:
    """True when any argument is under a ``jax.vmap`` batching trace.

    The fused kernels' Pallas lowering rejects the batching rule's block
    shapes, so vmapped calls route to the XLA path instead of erroring.
    Walks the tracer stack (a ``vmap(grad(f))`` argument is a JVPTracer
    wrapping a BatchTracer) by NAME, avoiding any private-module import.
    (A vmap OVER a jit boundary batches the already-traced jaxpr and
    cannot be detected here — the public ops accept a leading batch axis
    natively, which is both faster and always safe.)"""
    import jax

    def walk(a) -> bool:
        for _ in range(16):
            if not isinstance(a, jax.core.Tracer):
                return False
            if type(a).__name__ == "BatchTracer":
                return True
            nxt = getattr(a, "primal", None)
            if nxt is None:
                nxt = getattr(a, "val", None)
            if nxt is None or nxt is a:
                return False
            a = nxt
        return False

    return any(walk(a) for a in arrays)


def try_pallas(fn):
    """Run a fused-kernel branch, returning None under forward-mode autodiff.

    The kernels' custom_vjp supports reverse mode only; jax raises a
    specific TypeError at trace time for jvp/jacfwd. Catching exactly that
    lets the caller fall back to the XLA path so forward-mode works over
    every public op (any other TypeError propagates)."""
    try:
        return fn()
    except TypeError as e:
        if "forward-mode autodiff" in str(e):
            return None
        raise


def pallas_interpret_mode() -> bool:
    """Pallas kernels run in interpreter mode off-TPU (CPU test stand-in)."""
    return not is_tpu()


def vma_struct(shape, dtype, *operands):
    """``jax.ShapeDtypeStruct`` for a pallas_call output, carrying the union
    of the operands' varying-manual-axes.

    Inside a ``shard_map`` with vma tracking on (the jax 0.9 default), every
    value is typed with the mesh axes it varies over, and ``pallas_call``
    refuses a plain ShapeDtypeStruct (vma=None). Outside shard_map the union
    is empty and this degrades to the plain struct, so the fused kernels can
    use it unconditionally."""
    import jax

    vma: frozenset = frozenset()
    for op in operands:
        try:
            v = jax.typeof(op).vma
        except Exception:
            v = None
        if v:
            vma |= frozenset(v)
    try:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    except TypeError:  # jax without the vma parameter
        return jax.ShapeDtypeStruct(shape, dtype)
