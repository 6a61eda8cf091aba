"""Live directory ingest (io/live.py): the transport-free analog of the
reference's live sensor topic — a producer drops velodyne-format .bin
files, the stream consumes them as they appear (SURVEY §5.8)."""

import os
import threading
import time

import numpy as np

from icpslam_tpu.io import live


def _write_scan(dir_, name: str, pts: np.ndarray) -> None:
    """Producer contract: write to a temp name, rename into place."""
    refl = np.zeros((pts.shape[0], 1), np.float32)
    tmp = os.path.join(dir_, name + ".tmp")
    np.c_[pts, refl].astype(np.float32).tofile(tmp)
    os.rename(tmp, os.path.join(dir_, name))


def _make_pts(seed: int, n: int = 300) -> np.ndarray:
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    # keep everything inside the default range gates
    r = np.linalg.norm(pts, axis=-1)
    return pts[(r > 3.0) & (r < 70.0)]


class TestDirectoryStream:
    def test_consumes_files_as_they_arrive(self, tmp_path):
        d = str(tmp_path)
        n_scans = 6
        expected = [_make_pts(i) for i in range(n_scans)]

        def producer():
            for i in range(n_scans):
                _write_scan(d, f"{100.0 + 0.1 * i:.6f}.bin", expected[i])
                time.sleep(0.08)
            with open(os.path.join(d, live.STOP_FILE), "w"):
                pass

        t = threading.Thread(target=producer)
        t.start()
        got = list(
            live.directory_stream(d, capacity=1024, poll_interval=0.02)
        )
        t.join()

        assert len(got) == n_scans
        stamps = [s for _, s in got]
        assert stamps == sorted(stamps)
        assert abs(stamps[0] - 100.0) < 1e-6
        for (cloud, _), pts in zip(got, expected):
            n = int(np.asarray(cloud.mask).sum())
            assert n == pts.shape[0]
            np.testing.assert_allclose(
                np.asarray(cloud.points)[:n], pts, atol=1e-6
            )

    def test_idle_timeout_ends_stream(self, tmp_path):
        d = str(tmp_path)
        _write_scan(d, "000000.bin", _make_pts(0))
        t0 = time.monotonic()
        got = list(
            live.directory_stream(
                d, capacity=1024, poll_interval=0.02, idle_timeout=0.3
            )
        )
        assert len(got) == 1
        assert time.monotonic() - t0 < 5.0

    def test_watermark_prevents_reingest_after_eviction(
        self, tmp_path, monkeypatch
    ):
        # Mission-scale runs exceed _SEEN_LIMIT; if the producer never
        # deletes consumed files, evicted names must NOT reappear as
        # duplicates (ADVICE r3). Shrink the limit so eviction fires.
        monkeypatch.setattr(live, "_SEEN_LIMIT", 4)
        d = str(tmp_path)
        n_scans = 10
        for i in range(n_scans):
            _write_scan(d, f"{100.0 + 0.1 * i:.6f}.bin", _make_pts(i))
        with open(os.path.join(d, live.STOP_FILE), "w"):
            pass
        got = list(live.directory_stream(d, capacity=1024, poll_interval=0.02))
        # old files are still on disk and their names were evicted from
        # the bookkeeping dict — the stamp watermark must keep them out
        assert len(got) == n_scans
        stamps = [s for _, s in got]
        assert stamps == sorted(stamps)
        assert len(set(stamps)) == n_scans

    def test_growing_file_defers_idle_timeout(self, tmp_path):
        # One large file written slower than idle_timeout must not end
        # the stream mid-copy: growth counts as producer activity.
        d = str(tmp_path)
        pts = _make_pts(2, n=400)
        raw = np.c_[pts, np.zeros((pts.shape[0], 1), np.float32)].astype(
            np.float32
        ).tobytes()
        dest = os.path.join(d, "000007.bin")

        def slow_producer():
            # grow in NON-record-aligned steps (never consumable early),
            # with total duration > idle_timeout but each step within it
            with open(dest, "wb") as f:
                step = len(raw) // 5 - 3  # not a multiple of 16
                for off in range(0, len(raw), step):
                    f.write(raw[off : off + step])
                    f.flush()
                    time.sleep(0.12)
            with open(os.path.join(d, live.STOP_FILE), "w"):
                pass

        t = threading.Thread(target=slow_producer)
        t.start()
        got = list(
            live.directory_stream(
                d, capacity=1024, poll_interval=0.02, idle_timeout=0.4
            )
        )
        t.join()
        assert len(got) == 1
        n = int(np.asarray(got[0][0].mask).sum())
        assert n == pts.shape[0]

    def test_partial_files_are_ignored(self, tmp_path):
        d = str(tmp_path)
        # a producer mid-write must not be consumed
        pts = _make_pts(1)
        np.c_[pts, np.zeros((pts.shape[0], 1), np.float32)].astype(
            np.float32
        ).tofile(os.path.join(d, "000001.bin.tmp"))
        _write_scan(d, "000000.bin", _make_pts(0))
        with open(os.path.join(d, live.STOP_FILE), "w"):
            pass
        got = list(live.directory_stream(d, capacity=1024, poll_interval=0.02))
        assert len(got) == 1
