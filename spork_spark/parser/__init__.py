from .pig import (PigParser, PigSyntaxError, check_script, preprocess,
                  read_param_file, run_script, substitute_params)

__all__ = ["PigParser", "PigSyntaxError", "check_script", "preprocess",
           "read_param_file", "run_script", "substitute_params"]
