from . import expressions, logical
from .relation import Engine, Relation

__all__ = ["expressions", "logical", "Engine", "Relation"]
