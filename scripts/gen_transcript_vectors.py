#!/usr/bin/env python
"""(Re)generate the golden Fiat-Shamir transcript vectors
(tests/vectors/transcripts.json). Run ONLY when the protocol is
intentionally changed; the diff is the reviewable record of the change.
See DESIGN.md "Protocol specification" and tests/test_transcript.py."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("CSTARK_CURVE", "subfield")

from tests.test_transcript import generate_all  # noqa: E402

out = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "vectors", "transcripts.json")
os.makedirs(os.path.dirname(out), exist_ok=True)
with open(out, "w") as f:
    json.dump(generate_all(), f, indent=1, sort_keys=True)
print("wrote", out)
