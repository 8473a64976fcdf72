from .expr import ExprCompiler
from .plan import PlanCompiler

__all__ = ["ExprCompiler", "PlanCompiler"]
