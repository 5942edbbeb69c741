"""Evaluation-harness tests: scoring, answer parsing, polygons, COCO reader."""

import json

import numpy as np
import pytest

from grasp_any_region_tpu.data.rle import encode_rle, polygon_to_mask, segmentation_to_mask
from grasp_any_region_tpu.evaluation.garbench import build_question, score_vqa
from grasp_any_region_tpu.evaluation.judges.dlc_judge import evaluate_one, parse_pred
from grasp_any_region_tpu.evaluation.judges.pairwise_judge import parse_scores, summarize


def test_score_vqa_exact_match():
    items = [
        {"type": "color", "answer": "A", "model_output": "a"},
        {"type": "color", "answer": "B", "model_output": "C"},
        {"type": "shape", "answer": "D", "model_output": "D"},
    ]
    s = score_vqa(items)
    assert s["color"] == 50.0 and s["shape"] == 100.0
    assert s["overall"] == 66.7


def test_build_question_vqa():
    item = {"question": "Which is red?", "choices": ["A. <Prompt0>", "B. <Prompt1>"]}
    q = build_question(item, "vqa")
    assert q.startswith("Question: Which is red?\nOptions:\nA. <Prompt0>\nB. <Prompt1>")
    assert q.endswith("Answer with the correct option's letter directly.")


def test_parse_pred_variants():
    choices = ["The color is red.", "The color is blue.", "Not mentioned."]
    assert parse_pred("B", choices) == 1
    assert parse_pred("b. the color is blue.", choices) == 1
    assert parse_pred("The color is red.", choices) == 0
    assert parse_pred("I think the answer is: not mentioned.", choices) == 2
    assert parse_pred("A\nbecause...", choices) == 0
    assert parse_pred("totally unrelated", choices) is None


def test_evaluate_one_scoring_and_recognition_gate():
    class FakeClient:
        def __init__(self, answers):
            self.answers = list(answers)

        def chat(self, messages):
            return self.answers.pop(0)

    qs = [
        {"question": "recog?", "choices": [["correct", "correct"], ["incorrect", "incorrect"]], "type": "recognition"},
        {"question": "q1", "choices": [["good", 1.0], ["bad", -1.0]], "type": "positive"},
        {"question": "q2", "choices": [["mentioned wrongly", -1.0], ["not mentioned", 1.0]], "type": "negative"},
    ]
    info = evaluate_one(FakeClient(["A", "A", "B"]), qs, "caption", images=[])
    assert info["recognition_result"] is True
    assert info["score_pos"] == 1.0 and info["score_neg"] == 1.0

    # failed recognition clamps positive scores to <= 0
    info2 = evaluate_one(FakeClient(["B", "A", "B"]), qs, "caption", images=[])
    assert info2["recognition_result"] is False
    assert info2["score_pos"] == 0.0


def test_pairwise_scores_and_summary():
    assert parse_scores("8 6\nexplanation") == [8.0, 6.0]
    assert parse_scores("garbage") is None
    recs = [
        {"scores": [8.0, 6.0], "dataset_name": "natural"},
        {"scores": [5.0, 5.0], "dataset_name": "natural"},
        {"scores": None},
    ]
    s = summarize(recs)
    assert s["overall"] == round((5.5 / 6.5) * 100, 1)
    assert s["natural"] == s["overall"]


def test_polygon_to_mask_rectangle():
    # axis-aligned rectangle [2, 10] x [3, 8] (x, y corners)
    poly = [[2, 3, 10, 3, 10, 8, 2, 8]]
    m = polygon_to_mask(poly, 12, 14)
    # pixel centers strictly inside: x in [2, 9], y in [3, 7]
    assert m[5, 5] == 1 and m[3, 2] == 1
    assert m[2, 5] == 0 and m[9, 5] == 0 and m[5, 11] == 0
    assert m.sum() == (10 - 2) * (8 - 3)


def test_polygon_triangle_and_rle_seg():
    tri = [[0, 0, 8, 0, 0, 8]]
    m = polygon_to_mask(tri, 8, 8)
    assert m[0, 0] == 1 and m[7, 7] == 0
    assert 20 <= m.sum() <= 36  # half of 64 +- boundary
    rle = encode_rle(m)
    np.testing.assert_array_equal(segmentation_to_mask(rle, 8, 8), m)


def test_coco_reader(tmp_path):
    from grasp_any_region_tpu.evaluation.coco import COCO

    m = np.zeros((10, 12), np.uint8)
    m[2:6, 3:9] = 1
    rle = encode_rle(m)
    rle["counts"] = rle["counts"].decode()
    d = {
        "images": [{"id": 1, "height": 10, "width": 12, "file_name": "x.jpg"}],
        "annotations": [
            {"id": 7, "image_id": 1, "area": 24.0, "segmentation": rle, "category_id": 1},
            {"id": 8, "image_id": 1, "area": 999.0, "segmentation": rle, "category_id": 1},
        ],
        "categories": [{"id": 1, "name": "thing"}],
    }
    p = tmp_path / "coco.json"
    p.write_text(json.dumps(d))
    coco = COCO(str(p))
    assert coco.get_img_ids() == [1]
    assert coco.get_ann_ids(1) == [7, 8]
    assert coco.get_ann_ids(1, area_max=100) == [7]
    np.testing.assert_array_equal(coco.ann_to_mask(7), m)


def test_paint_text_box_geometry():
    """Numbered-box markup: darkening, green rectangle, label pixels
    (MDVP paint_util.py:78 semantics)."""
    import numpy as np
    from grasp_any_region_tpu.evaluation.judges.paint import (
        paint_annotation,
        paint_text_box,
        paint_text_point,
    )

    img = np.full((100, 120, 3), 200, np.uint8)
    out = paint_text_box(img, [(30, 40, 50, 30)])
    assert out.shape == img.shape
    # background darkened by alpha=0.8
    assert abs(int(out[5, 5, 0]) - 160) <= 1
    # rectangle edge is green
    assert tuple(out[40, 60]) == (0, 255, 0)   # top edge at y=40
    assert tuple(out[70, 60]) == (0, 255, 0)   # bottom edge y=40+30
    # label area (x+4, y+20 baseline) contains white and black pixels
    patch = out[40:62, 30:60]
    assert (patch == 255).all(axis=-1).any(), "no white label text"
    assert (patch == 0).all(axis=-1).any(), "no black label background"

    out2 = paint_text_point(img, [(60, 50)])
    assert tuple(out2[50, 60]) == (0, 255, 0)  # filled dot center
    assert abs(int(out2[5, 5, 0]) - 140) <= 1  # alpha=0.7

    assert np.array_equal(paint_annotation(img, {}), img)
    assert not np.array_equal(
        paint_annotation(img, {"bbox": [(10, 10, 20, 20)]}), img
    )


def test_mdvp_transfer_carries_annotation_and_context():
    from grasp_any_region_tpu.evaluation.mdvp import context_for, transfer

    results = [
        {
            "image_path": "a.jpg",
            "dataset_name": "mdvp_natural",
            "caption": "pred",
            "gt": "ref",
            "annotation": {"bbox": [[1, 2, 3, 4]]},
        }
    ]
    tri = transfer(results)[0]
    assert tri["annotation"] == {"bbox": [[1, 2, 3, 4]]}
    assert tri["context"] == "The image is a natural image."
    assert context_for("ocr_chart") is not None
    assert context_for(None) is None


MDVP_EVAL_ROOT = "/root/reference/evaluation/MDVP-Bench/mdvp_for_gpt4v_eval"


def test_mdvp_gpt4v_eval_dir_loads_reference_format():
    """Consume the authors' shipped judge-input layout end-to-end: triplets
    with annotations + context, and the set-of-marks painter accepts the
    real bbox geometry."""
    import os

    phase = os.path.join(MDVP_EVAL_ROOT, "natural_detailed_caption_box")
    if not os.path.isdir(phase):
        import pytest

        pytest.skip("reference MDVP eval dir not present")
    import numpy as np

    from grasp_any_region_tpu.evaluation.judges.paint import paint_annotation
    from grasp_any_region_tpu.evaluation.mdvp import load_gpt4v_eval_dir

    triplets = load_gpt4v_eval_dir(phase)
    assert len(triplets) == 10
    tri = triplets[0]
    assert tri["question"] and tri["answer"] and tri["prediction"]
    assert tri["context"] == "The image is a natural image."
    assert tri["annotation"]["bbox"], "natural phase ships bboxes"
    # paint the real annotation on a synthetic canvas of plausible size
    img = np.full((720, 1280, 3), 180, np.uint8)
    out = paint_annotation(img, tri["annotation"])
    assert out.shape == img.shape and not np.array_equal(out, img)
