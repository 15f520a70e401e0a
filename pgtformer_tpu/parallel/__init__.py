from pgtformer_tpu.parallel.mesh import (
    make_mesh, DATA_AXIS, batch_spec, replicated_spec)
