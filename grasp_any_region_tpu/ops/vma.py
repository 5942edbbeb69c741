"""Pallas out_shape structs that survive shard_map's varying-manual-axes check.

When a ``pallas_call`` is traced INSIDE a ``jax.shard_map`` body with
``check_vma=True`` (the default, and deliberately kept on for the pipeline
schedules in parallel/pipeline.py), every ``jax.ShapeDtypeStruct`` in
``out_shape`` must declare which manual mesh axes the output varies over —
a bare struct raises "vma on jax.ShapeDtypeStruct must not be None".
Outside shard_map the same structs must NOT carry a vma set.

``pallas_struct`` derives the right answer from the kernel's own operands:
a Pallas kernel output varies over exactly the union of the manual axes its
inputs vary over (the kernel is a per-device program; it cannot introduce
or remove variance). ``jax.typeof(x).vma`` is empty at top level, so the
helper degrades to a plain struct there.
"""

from __future__ import annotations

import jax

__all__ = ["pallas_struct"]


def _in_manual_context() -> bool:
    # Inside a shard_map body the ambient abstract mesh has Manual axes;
    # at top level it is the empty mesh. The check_vma validation fires
    # exactly when manual axes are present, so mirror that condition.
    try:
        from jax._src.mesh import get_abstract_mesh

        return bool(get_abstract_mesh().manual_axes)
    except Exception:
        return False


def pallas_struct(shape, dtype, *like):
    """ShapeDtypeStruct for a pallas_call out_shape, vma-union of ``like``.

    ``like`` are the kernel operands (traced arrays) whose manual-axes
    variance the output inherits. Inside shard_map the struct always
    carries a vma set — check_vma rejects a bare struct even for a fully
    replicated (empty-vma) output. Outside shard_map it degrades to a
    plain struct.
    """
    vma = frozenset()
    for x in like:
        vma = vma | getattr(jax.typeof(x), "vma", frozenset())
    if not vma and not _in_manual_context():
        return jax.ShapeDtypeStruct(shape, dtype)
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
