from .zarr_lite import (
    open_dataset,
    open_zarr_tree,
    read_group,
    write_dataset,
    write_group,
    write_tree,
)

__all__ = [
    "write_group",
    "read_group",
    "write_tree",
    "open_zarr_tree",
    "write_dataset",
    "open_dataset",
]
