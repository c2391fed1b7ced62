"""Round-3 host-path profiling: where do 'plans', 'assemble' and decode
'parse' actually spend their time on this host?

Runs the production batched pipeline on CPU JAX (device numbers are
meaningless here; host stage numbers are what we measure) over the same
42-image LIVE batch bench.py uses, then breaks the host stages down with
fine-grained timers.
"""

import cProfile
import glob
import io
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from aejpeg_tpu.codec.batch_encode import encode_batch  # noqa: E402
from aejpeg_tpu.codec.batch_decode import decode_batch  # noqa: E402
from aejpeg_tpu.config import CodecConfig  # noqa: E402
from aejpeg_tpu.io.image import ImageData  # noqa: E402

LIVE = "/root/reference/test_images/LIVE_image_quality_assessment_database"


def load_images(batch=14, replicate=3):
    import imageio.v3 as iio
    paths = sorted(glob.glob(f"{LIVE}/*.bmp"))
    imgs = []
    for p in paths:
        im = iio.imread(p)
        if im.shape == (512, 768, 3):
            imgs.append(ImageData(im.astype(np.float32) / 255.0,
                                  im.shape, ".bmp"))
        if len(imgs) == batch:
            break
    return (imgs * replicate)[:batch * replicate]


def main():
    images = load_images()
    cfg = CodecConfig("YCoCg", (20, 80), (4, 64), entropy_level=-1)
    print(f"cpu_count={os.cpu_count()}")

    blobs = encode_batch(images, cfg)  # warmup/compile
    timings = {}
    for _ in range(3):
        blobs = encode_batch(images, cfg, timings=timings)
    print("encode stages:", {k: round(v / 3, 4) for k, v in timings.items()})

    # cProfile one encode to see the Python-side hot spots
    pr = cProfile.Profile()
    pr.enable()
    encode_batch(images, cfg)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue())

    decode_batch(blobs, materialize=False)  # warmup
    dtim = {}
    for _ in range(3):
        decode_batch(blobs, timings=dtim, materialize=False)
    print("decode stages:", {k: round(v / 3, 4) for k, v in dtim.items()})

    pr = cProfile.Profile()
    pr.enable()
    decode_batch(blobs, materialize=False)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue())


if __name__ == "__main__":
    main()
