#!/bin/sh
# Build the native host crypto library (native/f63.c -> native/libf63.so).
# Generates the Rescue constant tables header from params/data.py first.
set -e
cd "$(dirname "$0")/.."
python - <<'EOF'
from certificate_stark_tpu.params import data as D

with open("native/rescue_tables.h", "w") as f:
    f.write("/* generated from certificate_stark_tpu/params/data.py */\n")
    f.write("static const u64 RESCUE_MDS[196] = {\n")
    f.write(",".join(f"{v}ULL" for v in D.RESCUE_MDS))
    f.write("};\n")
    f.write("static const u64 RESCUE_INV_MDS[196] = {\n")
    f.write(",".join(f"{v}ULL" for v in D.RESCUE_INV_MDS))
    f.write("};\n")
    f.write("static const u64 RESCUE_ARK[8][28] = {\n")
    for row in D.RESCUE_ARK:
        f.write("{" + ",".join(f"{v}ULL" for v in row) + "},\n")
    f.write("};\n")
print("wrote native/rescue_tables.h")
EOF
gcc -O3 -march=native -fopenmp -shared -fPIC -o native/libf63.so native/f63.c native/air_eval.c native/ntt.c native/deep_compose.c
echo "built native/libf63.so"
