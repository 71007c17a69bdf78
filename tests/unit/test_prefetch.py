"""Host-side prefetching loader (darsia_tpu/utils/prefetch.py)."""

from __future__ import annotations

import threading
import time

import pytest

from darsia_tpu.utils.prefetch import PrefetchResult, prefetch_map


class TestPrefetchMap:
    def test_order_and_values(self):
        out = list(prefetch_map(lambda x: x * 2, [3, 1, 2], depth=2))
        assert [r.item for r in out] == [3, 1, 2]
        assert [r.value for r in out] == [6, 2, 4]
        assert all(r.ok for r in out)

    def test_error_isolation(self):
        def fn(x):
            if x == "bad":
                raise RuntimeError("corrupt frame")
            return x.upper()

        out = list(prefetch_map(fn, ["a", "bad", "b"], depth=2))
        assert [r.ok for r in out] == [True, False, True]
        assert out[1].item == "bad"
        assert isinstance(out[1].error, RuntimeError)
        assert out[2].value == "B"

    def test_overlap(self):
        """Loads genuinely overlap: 6 x 50 ms on 3 workers << sequential."""

        def slow(x):
            time.sleep(0.05)
            return x

        t0 = time.perf_counter()
        out = list(prefetch_map(slow, range(6), depth=3, workers=3))
        elapsed = time.perf_counter() - t0
        assert [r.value for r in out] == list(range(6))
        assert elapsed < 0.25  # sequential would be 0.30+

    def test_sequential_fallback(self):
        seen_threads = set()

        def fn(x):
            seen_threads.add(threading.get_ident())
            return x

        out = list(prefetch_map(fn, [1, 2, 3], depth=0))
        assert [r.value for r in out] == [1, 2, 3]
        assert seen_threads == {threading.get_ident()}

    def test_single_item(self):
        out = list(prefetch_map(lambda x: x, [42], depth=4))
        assert len(out) == 1 and out[0].value == 42


class TestIterPrefetchedImages:
    def test_yields_none_on_failure(self, tmp_path):
        from darsia_tpu.presets.workflows.analysis.analysis_context import (
            iter_prefetched_images,
        )

        class Rig:
            def read_image(self, path):
                if "bad" in str(path):
                    raise IOError("unreadable")
                return f"img:{path.name}"

        class Ctx:
            fluidflower = Rig()
            image_paths = [tmp_path / "a.jpg", tmp_path / "bad.jpg",
                           tmp_path / "b.jpg"]

        rows = list(iter_prefetched_images(Ctx()))
        assert [index for index, _, _ in rows] == [1, 2, 3]
        assert rows[0][2] == "img:a.jpg"
        assert rows[1][2] is None
        assert rows[2][2] == "img:b.jpg"
