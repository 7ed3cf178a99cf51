from seedvc_tpu.parallel.mesh import (  # noqa: F401
    AxisNames,
    make_mesh,
    shard_batch,
    replicate,
)
from seedvc_tpu.parallel.sharding import (  # noqa: F401
    dit_param_sharding,
    logical_to_sharding,
)
