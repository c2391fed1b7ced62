"""Multi-host (DCN) scaling for the batched codec.

The codec carries no cross-image state, so the multi-host story is pure
data parallelism over processes: every host runs the full single-host
pipeline (codec/batch_encode.py) on its contiguous shard of the image
stream, with its own local chips driven through `encode_batch(mesh=...)`.
No collectives cross DCN — the reference analog is the per-image process
pool (/root/reference/test/analysis/metrics_computation.py:253-255), and
the dense redesign keeps it that way on purpose: stage B has no
plan-dependent gathers left, so there is no ragged bucket axis whose
imbalance an all-to-all would need to fix.

Launch recipe (one process per host):

    # host 0                                            # host 1
    python -c 'from aejpeg_tpu.parallel import multihost as mh; \
        mh.initialize("host0:1234", 2, 0); ...'         # process_id=1 on host 1

or via SLURM/GKE auto-detection: `mh.initialize()` defers entirely to
jax.distributed's environment discovery.

Scaling, measured (tools/measure_scaling.py -> results/scaling.md): the
2-process jax.distributed path on this single 2-core dev host reaches
71.3% efficiency WITH both processes contending for the same two cores —
a floor for true 2-host efficiency, where each process has its own
host.  The only serial costs are per-host jit compilation (amortized)
and stream orchestration; no collectives cross DCN.  Real 2-host numbers
remain blocked on hardware (this dev harness exposes one chip);
tests/test_multihost.py proves the 2-process path end-to-end on CPU with
byte-identical output, and results/scaling.md also shows the virtual
(4,2)-mesh shard_map program is cheaper than the single-device program
on identical bytes.
"""

from typing import List, Optional, Sequence, Tuple

from ..config import CodecConfig
from ..io.image import ImageData


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None, **kwargs) -> None:
    """jax.distributed.initialize wrapper (idempotent-safe to call once per
    process, BEFORE any jax computation)."""
    import jax
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)


def process_shard(n_items: int, num_processes: Optional[int] = None,
                  process_id: Optional[int] = None) -> slice:
    """Contiguous, balanced shard of [0, n_items) for this process."""
    import jax
    np_ = jax.process_count() if num_processes is None else num_processes
    pid = jax.process_index() if process_id is None else process_id
    base, rem = divmod(n_items, np_)
    start = pid * base + min(pid, rem)
    return slice(start, start + base + (1 if pid < rem else 0))


def encode_stream_sharded(images: Sequence[ImageData], config: CodecConfig,
                          batch_size: int = 16,
                          num_processes: Optional[int] = None,
                          process_id: Optional[int] = None
                          ) -> Tuple[List[int], List[bytes]]:
    """Encode THIS process's shard of a global image list; returns
    (global indices, blobs).  Every process must pass the same `images`
    order; concatenating all processes' outputs by index reproduces the
    single-process `encode_stream` byte-for-byte."""
    from ..codec.stream import encode_stream
    sh = process_shard(len(images), num_processes, process_id)
    idxs = list(range(sh.start, sh.stop))
    blobs = encode_stream(list(images[sh]), config, batch_size=batch_size)
    return idxs, blobs


def decode_stream_sharded(blobs: Sequence[bytes], batch_size: int = 16,
                          num_processes: Optional[int] = None,
                          process_id: Optional[int] = None
                          ) -> Tuple[List[int], List[ImageData]]:
    """Decode THIS process's shard of a global blob list."""
    from ..codec.stream import decode_stream
    sh = process_shard(len(blobs), num_processes, process_id)
    idxs = list(range(sh.start, sh.stop))
    return idxs, decode_stream(list(blobs[sh]), batch_size=batch_size)
