"""On-device negative sampling and random-walk generation."""

from force2vec_tpu.sampling.negative import sample_negative_ids
from force2vec_tpu.sampling.walks import sample_walks

__all__ = ["sample_negative_ids", "sample_walks"]
