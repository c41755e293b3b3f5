from . import nn_bruteforce

__all__ = ["nn_bruteforce"]
