"""ONNX export for the SAM mask decoder — in-browser click-to-mask parity.

The reference's gradio frontend decodes masks client-side with
onnxruntime-web (demo/gradio/frontend/src/components/helpers/
onnxModelAPI.tsx:60-68): per click it feeds `image_embeddings`,
`point_coords` (SAM-1024 space), `point_labels`, `orig_im_size`,
`mask_input`, `has_mask_input` and renders the returned mask with zero
server round-trips. Round 2 shipped the server-side `/point_to_mask`
path instead; this module closes the gap by exporting OUR JAX mask
decoder (sam/model.py:decode_masks + encode_points) to the exact same
ONNX interface, so the reference frontend can run against it unchanged.

Pipeline: the JAX param tree is mirrored into a `torch.nn.Module`
(`SamDecoderOnnx`) that reproduces decode_masks tensor-for-tensor (the
parity test holds to 1e-4), then serialized with the TorchScript ONNX
exporter. The env ships torch but not the `onnx` package; the exporter
only needs it to splice onnxscript custom functions into the proto — we
use none, so that post-pass is patched to identity (see
`_export_onnx_bytes`).

Reference interface: official SamOnnxModel (segment-anything
scripts/export_onnx_model.py) with `return_single_mask=True`, which is
what the ONNX file in the reference demo was produced with.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _t(x):
    import torch

    return torch.from_numpy(np.asarray(x, np.float32).copy())


def build_torch_decoder(params: dict, cfg, return_single_mask: bool = True):
    """Mirror sam/model.py decode_masks into a traceable torch.nn.Module.

    params: the JAX SAM param tree (init_sam_params layout); only the
    "prompt" and "decoder" subtrees are used. cfg: SAMConfig.
    """
    import torch
    import torch.nn.functional as F
    from torch import nn

    c = cfg.out_chans
    g = cfg.grid
    heads = cfg.decoder_heads
    nm = cfg.num_multimask_outputs + 1
    img_size = cfg.img_size

    dec = params["decoder"]
    pp = params["prompt"]

    class Attn(nn.Module):
        def __init__(self, ap):
            super().__init__()
            for k in ("wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo"):
                self.register_buffer(k, _t(ap[k]))

        def forward(self, q, k, v):
            b, nq, cc = q.shape
            dh = cc // heads
            qq = (q @ self.wq + self.bq).reshape(b, nq, heads, dh).permute(0, 2, 1, 3)
            kk = (k @ self.wk + self.bk).reshape(b, -1, heads, dh).permute(0, 2, 1, 3)
            vv = (v @ self.wv + self.bv).reshape(b, -1, heads, dh).permute(0, 2, 1, 3)
            logits = (qq * dh ** -0.5) @ kk.transpose(-1, -2)
            probs = torch.softmax(logits, dim=-1)
            out = (probs @ vv).permute(0, 2, 1, 3).reshape(b, nq, cc)
            return out @ self.wo + self.bo

    class LN(nn.Module):
        def __init__(self, lp):
            super().__init__()
            self.register_buffer("scale", _t(lp["scale"]))
            self.register_buffer("bias", _t(lp["bias"]))

        def forward(self, x):
            m = x.mean(-1, keepdim=True)
            v = ((x - m) ** 2).mean(-1, keepdim=True)
            return (x - m) / torch.sqrt(v + 1e-6) * self.scale + self.bias

    class Block(nn.Module):
        def __init__(self, bp):
            super().__init__()
            self.self_attn = Attn(bp["self_attn"])
            self.cross_t2i = Attn(bp["cross_t2i"])
            self.cross_i2t = Attn(bp["cross_i2t"])
            self.ln1, self.ln2 = LN(bp["ln1"]), LN(bp["ln2"])
            self.ln3, self.ln4 = LN(bp["ln3"]), LN(bp["ln4"])
            self.register_buffer("fc1", _t(bp["mlp_fc1"]))
            self.register_buffer("b1", _t(bp["mlp_b1"]))
            self.register_buffer("fc2", _t(bp["mlp_fc2"]))
            self.register_buffer("b2", _t(bp["mlp_b2"]))

        def forward(self, q, src, pos):
            q = self.ln1(q + self.self_attn(q, q, q))
            q = self.ln2(q + self.cross_t2i(q, src + pos, src))
            m = torch.relu(q @ self.fc1 + self.b1)
            q = self.ln3(q + (m @ self.fc2 + self.b2))
            src = self.ln4(src + self.cross_i2t(src + pos, q, q))
            return q, src

    class MLP3(nn.Module):
        def __init__(self, mp):
            super().__init__()
            for k in ("fc1", "b1", "fc2", "b2", "fc3", "b3"):
                self.register_buffer(k, _t(mp[k]))

        def forward(self, t):
            t = torch.relu(t @ self.fc1 + self.b1)
            t = torch.relu(t @ self.fc2 + self.b2)
            return t @ self.fc3 + self.b3

    class SamDecoderOnnx(nn.Module):
        def __init__(self):
            super().__init__()
            self.img_size = img_size
            self.register_buffer("pe_gaussian", _t(pp["pe_gaussian"]))
            self.register_buffer("point_embeds", _t(pp["point_embeds"]))
            self.register_buffer("not_a_point", _t(pp["not_a_point"]))
            self.register_buffer("no_mask", _t(pp["no_mask"]))
            self.register_buffer("iou_token", _t(dec["iou_token"]))
            self.register_buffer("mask_tokens", _t(dec["mask_tokens"]))
            self.blocks = nn.ModuleList(Block(bp) for bp in dec["blocks"])
            self.final_t2i = Attn(dec["final_t2i"])
            self.ln_final = LN(dec["ln_final"])
            # lax.conv_transpose applies the kernel spatially flipped
            # relative to torch's out[s*i+k] += x[i] * w[k] formulation
            import torch as _torch

            self.register_buffer(
                "upscale1", _torch.flip(_t(dec["upscale1"]), dims=[2, 3])
            )
            self.up_ln = LN(dec["up_ln"])
            self.register_buffer(
                "upscale2", _torch.flip(_t(dec["upscale2"]), dims=[2, 3])
            )
            self.hyper = nn.ModuleList(MLP3(mp) for mp in dec["hyper_mlps"])
            self.iou_mlp = MLP3(dec["iou_mlp"])
            # static image positional grid (sam/model.py:image_pe)
            ys = (np.arange(g, dtype=np.float32) + 0.5) / g
            yy, xx = np.meshgrid(ys, ys, indexing="ij")
            coords = np.stack([xx, yy], -1).reshape(1, g * g, 2)
            self.register_buffer("pe_grid", _t(coords))

        def _fourier(self, coords01):
            x = (2.0 * coords01 - 1.0) @ self.pe_gaussian
            x = 2 * np.pi * x
            return torch.cat([torch.sin(x), torch.cos(x)], dim=-1)

        def _encode_points(self, coords, labels):
            # coords in SAM-1024 pixel space (frontend sends click * samScale)
            pe = self._fourier(coords / self.img_size)
            lab = labels.unsqueeze(-1)
            emb = pe
            for i in range(4):
                emb = emb + (lab == float(i)) * self.point_embeds[i]
            return torch.where(
                lab == -1.0, self.not_a_point[0].expand_as(pe), emb
            )

        def forward(self, image_embeddings, point_coords, point_labels,
                    mask_input, has_mask_input, orig_im_size):
            b = image_embeddings.shape[0]
            sparse = self._encode_points(point_coords, point_labels)
            tokens = torch.cat([self.iou_token, self.mask_tokens], dim=0)
            tokens = tokens.unsqueeze(0).expand(b, nm + 1, c)
            q = torch.cat([tokens, sparse], dim=1)

            src = image_embeddings.reshape(b, c, g * g).permute(0, 2, 1)
            # dense prompt: the GAR demo always sends has_mask_input=0
            # (onnxModelAPI.tsx:54-60); a real mask prompt would need the
            # mask_downscaling convnet, which sam/model.py does not model.
            # has_mask_input scales a zeros-mean term so both inputs stay
            # live in the exported graph and the official feed dict works.
            src = src + self.no_mask[0] + (
                has_mask_input.sum() * mask_input.mean() * 0.0
            )
            pos = self._fourier(self.pe_grid)

            for blk in self.blocks:
                q, src = blk(q, src, pos)
            q = self.ln_final(q + self.final_t2i(q, src + pos, src))

            iou_tok = q[:, 0]
            mask_toks = q[:, 1:1 + nm]

            feat = src.permute(0, 2, 1).reshape(b, c, g, g)
            feat = F.conv_transpose2d(feat, self.upscale1, stride=2)
            feat = self.up_ln(feat.permute(0, 2, 3, 1))
            feat = F.gelu(feat)
            feat = F.conv_transpose2d(
                feat.permute(0, 3, 1, 2), self.upscale2, stride=2
            ).permute(0, 2, 3, 1)
            feat = F.gelu(feat)  # (B, 4g, 4g, c//8)

            hyper = torch.stack(
                [self.hyper[i](mask_toks[:, i]) for i in range(nm)], dim=1
            )  # (B, nm, c//8)
            # matmul, not einsum: onnxruntime-web builds may lack Einsum
            flat = feat.reshape(b, 4 * g * 4 * g, c // 8)
            low_res = (hyper @ flat.transpose(-1, -2)).reshape(
                b, nm, 4 * g, 4 * g
            )
            iou = self.iou_mlp(iou_tok)  # (B, nm)

            if return_single_mask:
                # argmax over the multimask outputs, skipping index 0 (the
                # single-mask head) — matches sam/model.py:predict_mask
                best = torch.argmax(iou[:, 1:], dim=-1) + 1
                bidx = torch.arange(b)
                low_res = low_res[bidx, best].unsqueeze(1)
                iou = iou[bidx, best].unsqueeze(1)

            masks = self._postprocess(low_res, orig_im_size)
            return masks, iou, low_res

        def _postprocess(self, masks, orig_im_size):
            masks = F.interpolate(
                masks, size=(self.img_size, self.img_size),
                mode="bilinear", align_corners=False,
            )
            # crop away the pad of the aspect-preserving resize
            # (frontend samScale = 1024 / max(h, w))
            scale = self.img_size / torch.max(orig_im_size)
            resized = torch.floor(orig_im_size * scale + 0.5).to(torch.int64)
            masks = masks[..., : resized[0], : resized[1]]
            hw = orig_im_size.to(torch.int64)
            return F.interpolate(
                masks, size=(hw[0], hw[1]), mode="bilinear",
                align_corners=False,
            )

    return SamDecoderOnnx().eval()


def _export_onnx_bytes(module, example_inputs, input_names, output_names,
                       dynamic_axes):
    """torch.onnx (TorchScript exporter) without the `onnx` package: the
    only step that imports it is `_add_onnxscript_fn`, which splices
    onnxscript custom functions into the proto — we register none, so the
    pass is identity and is patched out."""
    import io

    import torch

    try:
        from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

        orig = onnx_proto_utils._add_onnxscript_fn
        onnx_proto_utils._add_onnxscript_fn = (
            lambda model_bytes, custom_opsets: model_bytes
        )
    except ImportError:  # older exporter layouts keep onnx optional
        onnx_proto_utils, orig = None, None
    try:
        buf = io.BytesIO()
        torch.onnx.export(
            module, example_inputs, buf,
            input_names=input_names, output_names=output_names,
            dynamic_axes=dynamic_axes, dynamo=False, opset_version=17,
        )
        return buf.getvalue()
    finally:
        if onnx_proto_utils is not None:
            onnx_proto_utils._add_onnxscript_fn = orig


def mask_decoder_onnx_bytes(
    params: dict,
    cfg,
    return_single_mask: bool = True,
) -> bytes:
    """Serialize the mask decoder as an ONNX model with the official SAM
    decoder interface (image_embeddings, point_coords, point_labels,
    mask_input, has_mask_input, orig_im_size) -> (masks, iou_predictions,
    low_res_masks)."""
    import torch

    module = build_torch_decoder(params, cfg, return_single_mask)
    g = cfg.grid
    example = (
        torch.randn(1, cfg.out_chans, g, g),
        torch.tensor([[[64.0, 64.0], [0.0, 0.0]]]),
        torch.tensor([[1.0, -1.0]]),
        torch.zeros(1, 1, 4 * g, 4 * g),
        torch.zeros(1),
        torch.tensor([768.0, 1024.0]),
    )
    return _export_onnx_bytes(
        module, example,
        input_names=["image_embeddings", "point_coords", "point_labels",
                     "mask_input", "has_mask_input", "orig_im_size"],
        output_names=["masks", "iou_predictions", "low_res_masks"],
        dynamic_axes={
            "point_coords": {1: "num_points"},
            "point_labels": {1: "num_points"},
        },
    )


def export_mask_decoder_onnx(
    params: dict,
    cfg,
    path: str,
    return_single_mask: bool = True,
) -> Optional[str]:
    """Write `<path>` as an ONNX mask decoder (see mask_decoder_onnx_bytes).
    Returns the path."""
    data = mask_decoder_onnx_bytes(params, cfg, return_single_mask)
    with open(path, "wb") as f:
        f.write(data)
    return path
