from .sharding import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_sweep_inputs,
    sharded_biot_savart,
    sharded_film_data,
    sharded_self_field,
)
