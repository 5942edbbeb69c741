"""Compile-target platform resolution for kernel dispatch.

Kernel-path decisions (run the Mosaic kernel vs the Pallas interpreter /
XLA reference, pick the fused decode path, enable the fused ViT blocks)
must key off the platform the program is being COMPILED FOR — which is the
host's default backend in normal execution, but NOT under deviceless AOT
lowering (utils/aot.py lowers for a v5e topology from a CPU host; keying
off `jax.default_backend()` there silently lowers interpreter/XLA fallback
programs and the memory accounting measures the wrong executable).

`force_compile_target("tpu")` scopes an override; `utils/aot.py` applies
it around every topology lowering so the compiled artifact is the real
deployment program.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax

_OVERRIDE: Optional[str] = None


def compile_target() -> str:
    """The platform kernels should be selected for ("tpu", "cpu", ...)."""
    return _OVERRIDE or jax.default_backend()


def is_tpu() -> bool:
    return compile_target() == "tpu"


@contextlib.contextmanager
def force_compile_target(platform: str) -> Iterator[None]:
    """Scope kernel dispatch to `platform` regardless of the host backend.

    TRACE-time only: the decision is baked into the jaxpr, so the override
    must wrap the `.lower()` / first trace, not the execution."""
    global _OVERRIDE
    prev = _OVERRIDE
    _OVERRIDE = platform
    try:
        yield
    finally:
        _OVERRIDE = prev
