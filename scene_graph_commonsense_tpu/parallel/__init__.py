from scene_graph_commonsense_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicate)
