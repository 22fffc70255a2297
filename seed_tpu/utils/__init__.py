from .registry import register, lookup, instantiate, load_config

__all__ = ["register", "lookup", "instantiate", "load_config"]
