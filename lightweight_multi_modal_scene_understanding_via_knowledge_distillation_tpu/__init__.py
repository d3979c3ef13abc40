"""Alias package: the full project name re-exporting `lmsu_tpu`.

The implementation lives in the short importable package `lmsu_tpu`; this
module lets users import by the project's full name:

    import lightweight_multi_modal_scene_understanding_via_knowledge_distillation_tpu as lmsu
    lmsu.models.create_model(...)
"""

import sys

import lmsu_tpu
from lmsu_tpu import *  # noqa: F401,F403
from lmsu_tpu import (config, data, inference, models, ops, parallel,
                      serving, training, utils)

# Make `<long name>.models` style submodule imports resolve to lmsu_tpu's.
_PREFIX = __name__
for _name, _mod in list(sys.modules.items()):
    if _name == "lmsu_tpu" or _name.startswith("lmsu_tpu."):
        sys.modules[_PREFIX + _name[len("lmsu_tpu"):]] = _mod

__version__ = lmsu_tpu.__version__
