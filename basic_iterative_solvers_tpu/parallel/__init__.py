from .sharded import (  # noqa: F401
    make_mesh, shard_dia, shard_setup, sharded_spmv_dia, make_sharded_cg,
)
