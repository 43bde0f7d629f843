"""Regenerate the shipped deterministic model files
(erex/resources/models/*.model). Delegates to erex.training.

Run:  python tools/train_models.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from erex.training import train_from_seeds  # noqa: E402

if __name__ == "__main__":
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "erex", "resources", "models")
    print(train_from_seeds(120, 7, out))
    print(train_from_seeds(120, 7, out, dense=True))
