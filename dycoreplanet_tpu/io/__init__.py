from dycoreplanet_tpu.io.vtk import write_vts, write_pvd  # noqa: F401
from dycoreplanet_tpu.io.checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
