"""Native resize parity + PrefetchLoader semantics."""

import threading
import time

import numpy as np
import pytest

from grasp_any_region_tpu.data.loader import PrefetchLoader
from grasp_any_region_tpu.data.resize import resize_bicubic
from grasp_any_region_tpu.data import resize_native


@pytest.mark.skipif(not resize_native.available(), reason="no native lib")
@pytest.mark.parametrize("antialias", [True, False])
@pytest.mark.parametrize(
    "shape,out", [((37, 53, 3), (448, 448)), ((300, 200, 3), (64, 48)),
                  ((100, 100), (224, 336))],
)
def test_native_resize_matches_numpy(rng, shape, out, antialias):
    img = rng.integers(0, 256, size=shape).astype(np.uint8)
    a = resize_bicubic(img, *out, antialias=antialias, use_native=False)
    b = resize_native.resize_bicubic_native(img, *out, antialias=antialias)
    assert b is not None and b.shape == a.shape
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-9)


class _FakeDataset:
    """Records which thread built each item; simulates uneven build cost."""

    def __init__(self):
        self.threads = set()
        self.lock = threading.Lock()

    def __getitem__(self, i):
        if i % 3 == 0:
            time.sleep(0.01)
        with self.lock:
            self.threads.add(threading.get_ident())
        return {"i": i, "v": i * 10}


def test_prefetch_loader_order_and_content():
    ds = _FakeDataset()
    indices = [5, 3, 8, 1, 0, 9, 2]
    loader = PrefetchLoader(
        ds, indices, batch_size=3,
        collate_fn=lambda xs: [x["i"] for x in xs],
        num_workers=3, prefetch_batches=2,
    )
    assert len(loader) == 3
    got = list(loader)
    assert got == [[5, 3, 8], [1, 0, 9], [2]]
    assert len(ds.threads) >= 2  # actually parallel


def test_prefetch_loader_drop_last():
    ds = _FakeDataset()
    loader = PrefetchLoader(
        ds, range(7), batch_size=3, collate_fn=list,
        num_workers=2, drop_last=True,
    )
    assert len(loader) == 2
    assert sum(1 for _ in loader) == 2


def test_prefetch_loader_propagates_errors():
    class Boom:
        def __getitem__(self, i):
            if i == 4:
                raise ValueError("bad sample")
            return i

    loader = PrefetchLoader(
        Boom(), range(6), batch_size=2, collate_fn=list, num_workers=2,
    )
    it = iter(loader)
    assert next(it) == [0, 1]
    with pytest.raises(ValueError, match="bad sample"):
        next(it)  # batch [4, 5]... arrives after [2, 3]
        next(it)
