from hbird_tpu.parallel.mesh import make_mesh, default_mesh
from hbird_tpu.parallel.sharded_knn import sharded_knn_with_labels, pad_rows_for_mesh

__all__ = [
    "make_mesh",
    "default_mesh",
    "sharded_knn_with_labels",
    "pad_rows_for_mesh",
]
