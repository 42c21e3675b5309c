from .fastx import PaddedReads, pad_records, read_fastx, read_fastx_padded

__all__ = ["PaddedReads", "pad_records", "read_fastx", "read_fastx_padded"]
