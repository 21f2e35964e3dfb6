from prismer_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                       replicate_sharding, shard_params,
                                       param_shardings)

__all__ = ["make_mesh", "batch_sharding", "replicate_sharding",
           "shard_params", "param_shardings"]
