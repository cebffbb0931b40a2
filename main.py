"""trade-AId TPU — zero-flag entry point.

Mirrors the reference's UX (reference: main.py): run ``python main.py`` from
a directory containing either ``config.yaml`` + ``input_schemas.yaml`` (YAML
mode) or a programmatic ``config.py`` with ``input_schema_N`` lists (legacy
mode). All behavior is configured there; no CLI flags.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from trade_aid_multimodal_transformer_tpu.train.runner import run_training

if __name__ == "__main__":
    run_training(caller_globals=globals())
