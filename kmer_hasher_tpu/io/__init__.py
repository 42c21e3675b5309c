from .fastx import (
    PaddedReads,
    iter_fastx,
    pad_records,
    read_fastx,
    read_fastx_padded,
)

__all__ = ["PaddedReads", "iter_fastx", "pad_records", "read_fastx",
           "read_fastx_padded"]
