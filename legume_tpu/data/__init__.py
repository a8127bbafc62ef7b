from .sparse_io import (
    MemoryBackend,
    SparseBackend,
    create_sparse_from_triplets,
    open_sparse_matrix,
)
from .vec import SparseIoVec
