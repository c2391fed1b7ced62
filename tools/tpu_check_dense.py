"""TPU-vs-CPU correctness isolation for the dense pipeline.

mode=tpu: encode 2 LIVE images + decode them on the default (TPU) backend,
pickle blobs + decoded arrays.
mode=cpu: redo on CPU, compare blob bytes and decode outputs.
mode=stage: compare individual stage outputs (dense tables) TPU vs pickled.
"""

import pickle
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
mode = sys.argv[1]

import os
if mode == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from bench import load_images, SPACE, QUALITY, BLOCKS, ENTROPY_LEVEL
from aejpeg_tpu.config import CodecConfig
from aejpeg_tpu.codec.batch_encode import encode_batch, _stage_a, _stage_b_fn
from aejpeg_tpu.codec.batch_decode import decode_batch
from aejpeg_tpu.codec import dense

print("platform:", jax.devices()[0].platform, flush=True)
images = load_images()[:2]
cfg = CodecConfig(SPACE, QUALITY, BLOCKS, entropy_level=ENTROPY_LEVEL)

if mode in ("tpu", "cpu"):
    blobs = encode_batch(images, cfg)
    outs = decode_batch(blobs)
    for i, (im, out) in enumerate(zip(images, outs)):
        mse = np.mean((im.data - out.data) ** 2)
        print(f"img {i}: roundtrip PSNR {10*np.log10(1/mse):.2f} dB",
              flush=True)
    if mode == "tpu":
        with open("/tmp/dense_tpu.pkl", "wb") as f:
            pickle.dump({"blobs": blobs,
                         "dec": [o.data for o in outs]}, f)
    else:
        with open("/tmp/dense_tpu.pkl", "rb") as f:
            ref = pickle.load(f)
        same_blobs = [a == b for a, b in zip(blobs, ref["blobs"])]
        print("blob bytes equal (cpu vs tpu):", same_blobs, flush=True)
        # decode the TPU blobs on CPU
        outs2 = decode_batch(ref["blobs"])
        for i, o in enumerate(outs2):
            mse = np.mean((images[i].data - o.data) ** 2)
            print(f"tpu-blob decoded on cpu img {i}: "
                  f"PSNR {10*np.log10(1/mse):.2f} dB", flush=True)
        d = np.abs(ref["dec"][0] - outs2[0].data).max()
        print("decode arr maxdiff tpu vs cpu (same blobs):", d, flush=True)

elif mode == "stage":
    # stage-level dump: run stage_a+stage_b, save dense tables
    import jax.numpy as jnp
    h, w = images[0].original_shape[:2]
    layer_shapes = cfg.layer_shapes((h, w))
    import math
    mn, mx = cfg.block_size_range
    band = (int(math.log2(mn)) + 1, int(math.log2(mx)))
    spec = dense.batch_spec(layer_shapes, mn, mx)
    stacked = np.stack([im.data for im in images])
    u8 = np.round(stacked * 255.0).astype(np.uint8)
    gp, pb = _stage_a(jnp.asarray(u8), cfg.color_space, layer_shapes, band,
                      spec)
    jit_b, _ = _stage_b_fn(cfg, (h, w), 2)
    outs = jit_b(gp)
    dump = {
        "planes": [np.asarray(x) for x in gp],
        "levels": np.asarray(pb),
        "dense": [[np.asarray(a) for a in d] for d, s in outs],
        "slow": [[np.asarray(a) for a in s] for d, s in outs],
    }
    tag = jax.devices()[0].platform
    with open(f"/tmp/dense_stage_{tag}.pkl", "wb") as f:
        pickle.dump(dump, f)
    print("dumped", tag, flush=True)
    if tag == "cpu":
        with open("/tmp/dense_stage_tpu.pkl", "rb") as f:
            ref = pickle.load(f)
        for i, (a, b) in enumerate(zip(dump["planes"], ref["planes"])):
            print(f"planes[{i}] maxdiff:", np.abs(a - b).max(), flush=True)
        print("levels equal:", np.array_equal(dump["levels"], ref["levels"]))
        for gi in range(len(dump["dense"])):
            for si, (a, b) in enumerate(zip(dump["dense"][gi],
                                            ref["dense"][gi])):
                neq = (a != b).sum()
                print(f"dense[{gi}][{si}] n_diff: {neq} / {a.size}",
                      flush=True)
            for si, (a, b) in enumerate(zip(dump["slow"][gi],
                                            ref["slow"][gi])):
                if a.size:
                    print(f"slow[{gi}][{si}] n_diff: {(a != b).sum()}")
