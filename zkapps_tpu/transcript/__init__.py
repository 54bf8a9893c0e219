from .blake2b import Blake2bRead, Blake2bWrite

__all__ = ["Blake2bWrite", "Blake2bRead"]
