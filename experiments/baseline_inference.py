"""Duplicate entry point for parity with the reference layout
(/root/reference/experiments/baseline_inference.py is byte-identical to the
root-level script there; here we just delegate)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
from baseline_inference import main  # noqa: E402

if __name__ == "__main__":
    main()
