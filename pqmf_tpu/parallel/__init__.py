from pqmf_tpu.parallel import sharding, training

__all__ = ["sharding", "training"]
