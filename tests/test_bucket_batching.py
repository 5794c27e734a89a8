"""Per-bucket memory-constant batch sizing (XvaBatcher.batch_size_for)."""
import numpy as np

from xva_trainer_tpu.data.dataset import Bucket
from xva_trainer_tpu.data.xva_dataset import DEFAULT_V3_BUCKETS, XvaBatcher


def _bare_batcher(batch_size, buckets=DEFAULT_V3_BUCKETS, divisor=1):
    b = XvaBatcher([], batch_size=batch_size,
                   d_vector=np.zeros(512, np.float32), buckets=buckets)
    b.batch_divisor = divisor
    return b


def test_batch_scales_inverse_with_mel_len():
    b = _bare_batcher(32)
    sizes = {bk.mel_len: b.batch_size_for(bk) for bk in DEFAULT_V3_BUCKETS}
    # batch × frames stays constant up to the MAX_BUCKET_SCALE=2 clamp —
    # the segment-path (decoder/discriminator) memory scales with batch
    # alone, so the 256 bucket is capped at 2x, not 3x
    assert sizes[768] == 32
    assert sizes[512] == 48
    assert sizes[384] == 64
    assert sizes[256] == 64  # clamped (would be 96 unclamped)


def test_single_bucket_keeps_configured_batch():
    b = _bare_batcher(2, buckets=[Bucket(64, 128)])
    assert b.batch_size_for(Bucket(64, 128)) == 2


def test_divisor_rounds_to_mesh_multiple():
    b = _bare_batcher(32, divisor=8)
    for bk in DEFAULT_V3_BUCKETS:
        assert b.batch_size_for(bk) % 8 == 0
        assert b.batch_size_for(bk) >= 8
    # never rounds to zero even for tiny configured batches
    t = _bare_batcher(1, divisor=8, buckets=[Bucket(64, 128)])
    assert t.batch_size_for(Bucket(64, 128)) == 8
