from .brickwork_fast import manifold_overlap_batched  # noqa: F401
