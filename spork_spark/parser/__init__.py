from .pig import PigParser, PigSyntaxError, run_script, substitute_params

__all__ = ["PigParser", "PigSyntaxError", "run_script", "substitute_params"]
