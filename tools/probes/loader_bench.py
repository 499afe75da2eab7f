"""Host data-loader throughput: native C++ thread-pool core vs the Python
cv2 loop (densebox_tpu/native vs data/pipeline.py). Measures the full
decode + normalize + fit-resize + canvas-pad path on KITTI-resolution
JPEGs — the work a real-data training run does per batch on the host."""
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import cv2

from densebox_tpu.data.kitti import Sample
from densebox_tpu.data.pipeline import canvas_batch
from densebox_tpu.native import native_available

N_IMAGES = 64
CANVAS = (512, 512)          # the trainer's canvas (2x patch 256)


def main() -> None:
    rng = np.random.RandomState(0)
    with tempfile.TemporaryDirectory() as td:
        samples = []
        for i in range(N_IMAGES):
            img = rng.randint(0, 256, (375, 1242, 3), np.uint8)  # KITTI res
            p = os.path.join(td, f"{i:06d}.jpg")
            assert cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 92])
            samples.append(Sample(image_path=p,
                                  boxes=rng.uniform(0, 300, (8, 4))
                                  .astype(np.float32)))

        for backend in ("python", "native"):
            if backend == "native" and not native_available():
                print("native loader unavailable")
                continue
            canvas_batch(samples[:4], CANVAS, 16, backend=backend)  # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = canvas_batch(samples, CANVAS, 16, backend=backend)
                best = min(best, time.perf_counter() - t0)
            assert out["image"].shape == (N_IMAGES, *CANVAS, 3)
            print(f"{backend:7s}: {N_IMAGES / best:8.1f} images/s host "
                  f"({1e3 * best / N_IMAGES:.2f} ms/img, batch {N_IMAGES}, "
                  f"375x1242 jpeg -> {CANVAS} canvas)")


if __name__ == "__main__":
    main()
