"""Training loops, initialization, and schedules."""

from force2vec_tpu.train.trainer import Force2Vec, TrainConfig

__all__ = ["Force2Vec", "TrainConfig"]
