"""Tests: RLE codec, training dataset, trainer loop w/ checkpoint resume,
HF export round-trip."""

import base64
import io
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow
from PIL import Image

import jax

from grasp_any_region_tpu.core.config import gar_tiny
from grasp_any_region_tpu.data.dataset import (
    DatasetConfig,
    GraspAnyRegionDataset,
    length_grouped_indices,
)
from grasp_any_region_tpu.data.rle import decode_any, decode_rle, encode_rle
from grasp_any_region_tpu.data.tokenizer import GARTokenizer
from grasp_any_region_tpu.train.losses import IGNORE_INDEX

CFG = gar_tiny()


# ---------------------------------------------------------------------------
# RLE
# ---------------------------------------------------------------------------

def test_rle_uncompressed_decode():
    # column-major: 3x2 mask, counts [1, 2, 3] -> 0,1,1 | 0,0,0? no:
    # flat F-order length 6: one 0, two 1s, three 0s
    m = decode_rle({"size": [3, 2], "counts": [1, 2, 3]})
    flat = m.reshape(-1, order="F")
    np.testing.assert_array_equal(flat, [0, 1, 1, 0, 0, 0])


@pytest.mark.parametrize("shape", [(1, 1), (7, 5), (64, 48), (97, 211)])
def test_rle_roundtrip(rng, shape):
    m = (rng.random(shape) > 0.6).astype(np.uint8)
    rle = encode_rle(m)
    assert isinstance(rle["counts"], bytes)
    back = decode_rle(rle)
    np.testing.assert_array_equal(back, m)
    # uncompressed path too
    rle2 = encode_rle(m, compress=False)
    np.testing.assert_array_equal(decode_rle(rle2), m)


def test_rle_all_ones_and_zeros():
    ones = np.ones((5, 4), np.uint8)
    np.testing.assert_array_equal(decode_rle(encode_rle(ones)), ones)
    zeros = np.zeros((5, 4), np.uint8)
    np.testing.assert_array_equal(decode_rle(encode_rle(zeros)), zeros)
    assert len(decode_any([encode_rle(ones), encode_rle(zeros)])) == 2


# ---------------------------------------------------------------------------
# dataset
# ---------------------------------------------------------------------------

def _b64_image(rng, w=200, h=150):
    img = Image.fromarray((rng.random((h, w, 3)) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return "data:base64," + base64.b64encode(buf.getvalue()).decode()


@pytest.fixture
def ann_file(tmp_path, rng):
    w, h = 200, 150
    m1 = np.zeros((h, w), np.uint8); m1[10:60, 20:100] = 1
    m2 = np.zeros((h, w), np.uint8); m2[80:140, 50:180] = 1
    items = [
        {  # single-region style: 2 masks, 2 captions
            "image": _b64_image(rng, w, h),
            "mask_rle": [
                {k: (v.decode() if isinstance(v, bytes) else v) for k, v in encode_rle(m).items()}
                for m in (m1, m2)
            ],
            "conversations": [
                {"from": "human", "value": "placeholder"},
                {"from": "gpt", "value": "a red box."},
                {"from": "human", "value": "placeholder"},
                {"from": "gpt", "value": "a blue box. It is large."},
            ],
        },
        {  # multi-region style: conversations reference <PromptK>
            "image": _b64_image(rng, w, h),
            "mask_rle": [
                {k: (v.decode() if isinstance(v, bytes) else v) for k, v in encode_rle(m).items()}
                for m in (m1, m2)
            ],
            "conversations": [
                {"from": "human", "value": "Is <Prompt0> above <Prompt1>?"},
                {"from": "gpt", "value": "Yes."},
            ],
        },
        {  # no mask -> whole-image caption
            "image": _b64_image(rng, w, h),
            "conversations": [
                {"from": "human", "value": "placeholder"},
                {"from": "gpt", "value": "an image of noise."},
            ],
        },
    ]
    path = tmp_path / "ann.json"
    path.write_text(json.dumps(items))
    return str(path)


def test_dataset_items(ann_file):
    tok = GARTokenizer.synthetic(CFG.prompt_numbers)
    ds = GraspAnyRegionDataset(
        CFG, tok, DatasetConfig(annotation_paths=[ann_file], prompt_augmentation=True)
    )
    assert len(ds) == 3
    for idx in range(2):
        item = ds.build_item(idx)
        ids = item["input_ids"]
        n_img = (ids == CFG.image_token_id).sum()
        assert n_img == item["num_tiles"] * CFG.tokens_per_tile
        assert len(item["replay_pos"]) >= 1
        from grasp_any_region_tpu.data.chat import mask_labels

        labels = mask_labels(ids)
        assert (labels != IGNORE_INDEX).sum() > 0

    # multi-region item references both prompts
    item = ds.build_item(1)
    assert len(item["replay_pos"]) == 2


def test_dataset_refetch_on_bad_item(tmp_path, ann_file, rng):
    bad = [{"image": "/nonexistent.png", "conversations": []}]
    bad_path = tmp_path / "bad.json"
    bad_path.write_text(json.dumps(bad))
    tok = GARTokenizer.synthetic(CFG.prompt_numbers)
    ds = GraspAnyRegionDataset(
        CFG, tok,
        DatasetConfig(annotation_paths=[str(bad_path), ann_file], max_refetch=50),
    )
    item = ds[0]  # refetches into the good file
    assert item["input_ids"].ndim == 1


def test_length_grouped_indices():
    rng = np.random.default_rng(0)
    lengths = list(range(100))
    idx = length_grouped_indices(lengths, batch_size=2, rng=rng)
    assert sorted(idx.tolist()) == list(range(100))


# ---------------------------------------------------------------------------
# trainer: 3 steps + checkpoint resume
# ---------------------------------------------------------------------------

def test_trainer_steps_and_resume(tmp_path, ann_file):
    from grasp_any_region_tpu.models import init_gar_params
    from grasp_any_region_tpu.train.optimizer import OptimizerConfig
    from grasp_any_region_tpu.train.trainer import Trainer, TrainerConfig

    tok = GARTokenizer.synthetic(CFG.prompt_numbers)
    ds = GraspAnyRegionDataset(CFG, tok, DatasetConfig(annotation_paths=[ann_file]))
    params = init_gar_params(jax.random.PRNGKey(0), CFG)
    opt = OptimizerConfig(lr=1e-4, total_steps=4, accumulation=1)
    tcfg = TrainerConfig(
        work_dir=str(tmp_path / "run"), max_steps=2, batch_size=1,
        log_interval=1, save_interval=1, save_optimizer=True,
    )
    state = Trainer(CFG, params, ds, opt, tcfg).train()
    assert int(state.step) == 2

    # resume continues from step 2
    tcfg2 = TrainerConfig(
        work_dir=str(tmp_path / "run"), max_steps=3, batch_size=1,
        log_interval=1, save_interval=1,
    )
    tr2 = Trainer(CFG, params, ds, opt, tcfg2)
    assert int(tr2.state.step) == 2
    state2 = tr2.train()
    assert int(state2.step) == 3


# ---------------------------------------------------------------------------
# HF export <-> import round-trip
# ---------------------------------------------------------------------------

def test_hf_export_import_roundtrip(tmp_path):
    from grasp_any_region_tpu.core.weights import convert_hf_state_dict
    from grasp_any_region_tpu.models import init_gar_params
    from grasp_any_region_tpu.train.export import export_hf_state_dict

    params = init_gar_params(jax.random.PRNGKey(1), CFG)
    sd = export_hf_state_dict(CFG, params)
    back = convert_hf_state_dict(CFG, sd)

    flatA = {}
    flatB = {}
    from grasp_any_region_tpu.core.weights import flatten_params

    flatA = flatten_params(jax.tree_util.tree_map(np.asarray, params))
    flatB = flatten_params(back)
    # rope_freqs and padded embedding rows are handled specially
    for k, va in flatA.items():
        vb = flatB.get(k)
        assert vb is not None, f"missing {k} after round-trip"
        if k == "llm/embed":
            va = va[: CFG.extended_vocab_size]
            vb = vb[: CFG.extended_vocab_size]
        np.testing.assert_allclose(va, vb, rtol=1e-6, atol=1e-6, err_msg=k)


def test_native_checkpoint_roundtrip(tmp_path):
    from grasp_any_region_tpu.core.weights import load_checkpoint, save_checkpoint
    from grasp_any_region_tpu.models import init_gar_params

    params = init_gar_params(jax.random.PRNGKey(2), CFG)
    save_checkpoint(str(tmp_path / "ck"), CFG, params)
    cfg2, params2 = load_checkpoint(str(tmp_path / "ck"))
    assert cfg2 == CFG
    from grasp_any_region_tpu.core.weights import flatten_params

    a = flatten_params(jax.tree_util.tree_map(np.asarray, params))
    b = flatten_params(params2)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-6, err_msg=k)


def test_native_rle_parity(rng):
    """C++ codec (native/rle.cc) must agree with the numpy reference."""
    from grasp_any_region_tpu.data.rle import _decode_counts, decode_rle
    from grasp_any_region_tpu.data.rle_native import (
        available,
        decode_rle_native,
        encode_runs_native,
    )

    if not available():
        import pytest

        pytest.skip("native toolchain unavailable")
    for shape in [(1, 1), (33, 47), (256, 199)]:
        m = (rng.random(shape) > 0.35).astype(np.uint8)
        from grasp_any_region_tpu.data.rle import encode_rle

        rle = encode_rle(m)
        np.testing.assert_array_equal(decode_rle_native(rle), m)
        np.testing.assert_array_equal(
            encode_runs_native(m), np.asarray(_decode_counts(rle["counts"]))
        )


def test_cli_train_synthetic_e2e(tmp_path):
    """The full CLI surface on zero external assets: synthetic annotation
    JSON -> cli.train.main (bf16 params, 2 steps) -> orbax checkpoint +
    HF export dir. Mirrors the on-chip e2e recipe (docs/PERF_NOTES.md
    round-4 train addendum) at gar_tiny scale."""
    import jax.numpy as jnp

    from grasp_any_region_tpu.cli.train import main as train_main
    from grasp_any_region_tpu.data.synthetic import write_synthetic_annotations

    ann = write_synthetic_annotations(
        str(tmp_path / "ann.json"), n_items=6, image_size=(96, 80), seed=3
    )
    work = tmp_path / "run"
    export = tmp_path / "hf"
    train_main([
        "--preset", "gar_tiny", "--data", ann,
        "--work-dir", str(work), "--max-steps", "2",
        "--batch-size", "1", "--accumulation", "1", "--fsdp", "1",
        "--dtype", "bfloat16", "--export-hf", str(export),
    ])
    # orbax checkpoint written
    assert any(work.iterdir()), "work dir empty — no checkpoint saved"
    # HF export exists and carries bf16 tensors with reference names
    import safetensors.numpy as st

    files = list(export.glob("*.safetensors"))
    assert files, f"no safetensors in {export}"
    sd = {}
    for f in files:
        sd.update(st.load_file(str(f)))
    assert any(k.startswith("mllm.") for k in sd), sorted(sd)[:5]


def test_analytic_flops_sanity():
    """utils/flops.py is the MFU numerator for bench.py's train line —
    check scaling properties and the decoder/head split against hand
    counts (gar_1b: 16 L x d2048/f8192 decoder, 128512-row tied head)."""
    from grasp_any_region_tpu.core.config import gar_1b
    from grasp_any_region_tpu.utils.flops import gar_flops

    cfg = gar_1b()
    f1 = gar_flops(cfg, batch=1, seq=4096, tiles=17, train=True)
    # train = 4x fwd (bwd 2x + remat recompute 1x)
    assert f1["total"] == 4.0 * f1["fwd"]
    # hand count: decoder projection flops at S=4096
    per_layer = 2048 * 2048 + 2 * 2048 * 512 + 2048 * 2048 + 3 * 2048 * 8192
    dec_proj = 2.0 * per_layer * 16 * 4096
    assert f1["decoder"] > dec_proj  # + attention term
    assert f1["decoder"] < dec_proj * 1.25
    head = 2.0 * 2048 * cfg.padded_vocab_size * 4096
    assert f1["lm_head"] == head
    # decoder+head scale with seq; vision does not
    f2 = gar_flops(cfg, batch=1, seq=8192, tiles=17, train=True)
    assert f2["vision"] == f1["vision"]
    assert f2["lm_head"] == 2 * f1["lm_head"]
    # batch doubles tiles-held-constant: decoder doubles
    f3 = gar_flops(cfg, batch=2, seq=4096, tiles=17, train=True)
    assert f3["decoder"] == 2 * f1["decoder"]
