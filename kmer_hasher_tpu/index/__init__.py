from .position_index import KmerIndex

__all__ = ["KmerIndex"]
