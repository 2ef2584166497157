#!/usr/bin/env python
"""Extract protocol constants (Rescue MDS/ARK tables, Cheetah-f63 curve generator/B3)
from the reference Rust sources into Python data modules.

These are *protocol parameters* (public cryptographic constants), extracted as data so
that our TPU-native implementation is functionally compatible with the reference:
  - /root/reference/src/utils/rescue.rs:385-996 (MDS, INV_MDS, ARK; `BaseElement::new`
    = standard form)
  - /root/reference/src/utils/ecc.rs:23-45 (GENERATOR via `from_raw_unchecked` =
    Montgomery form with R=2^64; B3 via `new` = standard form)
"""
import re
import sys

P = 4719772409484279809  # = 2^62 + 2^56 + 2^55 + 1 = 131*2^55 + 1
R = 1 << 64
R_INV = pow(R % P, P - 2, P)

STATE_WIDTH = 14


def parse_values(text, ctor):
    return [int(m, 0) for m in re.findall(ctor + r"\(([0-9a-fA-Fx_]+)\)", text)]


def main():
    rescue_src = open("/root/reference/src/utils/rescue.rs").read()
    ecc_src = open("/root/reference/src/utils/ecc.rs").read()

    vals = parse_values(rescue_src, r"BaseElement::new")
    assert len(vals) == 588, len(vals)
    mds = vals[0:196]
    inv_mds = vals[196:392]
    ark_flat = vals[392:588]  # 7 rounds x 28 constants; round 8 is all-zero
    ark = [ark_flat[i * 28:(i + 1) * 28] for i in range(7)] + [[0] * 28]
    assert all(v < P for v in vals)

    # sanity: INV_MDS is the matrix inverse of MDS over F_p
    def matmul(a, b, n=STATE_WIDTH):
        return [
            sum(a[i * n + k] * b[k * n + j] for k in range(n)) % P
            for i in range(n) for j in range(n)
        ]
    ident = matmul(mds, inv_mds)
    assert all(ident[i] == (1 if i % (STATE_WIDTH + 1) == 0 else 0)
               for i in range(STATE_WIDTH * STATE_WIDTH)), "INV_MDS check failed"

    inv_alpha = int(re.search(r"INV_ALPHA: u64 = (\d+)", rescue_src).group(1))
    assert (3 * inv_alpha) % (P - 1) == 1, "INV_ALPHA check failed"

    gen_raw = parse_values(ecc_src, r"BaseElement::from_raw_unchecked")
    assert len(gen_raw) == 12, len(gen_raw)
    generator = [(v * R_INV) % P for v in gen_raw]  # convert out of Montgomery form
    b3 = parse_values(ecc_src, r"BaseElement::new")
    assert len(b3) == 6, len(b3)

    out = open("/root/repo/certificate_stark_tpu/params/data.py", "w")
    out.write('"""Protocol constants extracted from the reference '
              "(scripts/extract_constants.py).\n\n"
              "All values are standard-form integers mod p = 4719772409484279809\n"
              "(reference: src/utils/rescue.rs:385-996, src/utils/ecc.rs:23-45).\n"
              '"""\n\n')
    out.write("P = %d  # 2^62 + 2^56 + 2^55 + 1 = 131*2^55 + 1\n" % P)
    out.write("INV_ALPHA = %d  # 3 * INV_ALPHA == 1 mod (p-1)\n\n" % inv_alpha)
    out.write("RESCUE_MDS = %r\n\n" % (mds,))
    out.write("RESCUE_INV_MDS = %r\n\n" % (inv_mds,))
    out.write("RESCUE_ARK = %r\n\n" % (ark,))
    out.write("# Cheetah-f63 curve y^2 = x^3 + b over fp6 = fp2[v]/(v^3+v+1),"
              " fp2 = fp[u]/(u^2-2u-2)\n")
    out.write("CURVE_GENERATOR = %r\n\n" % (generator,))
    out.write("CURVE_B3 = %r  # 3*b\n" % (b3,))
    out.close()
    print("wrote params/data.py: MDS/INV_MDS/ARK/generator/B3 OK")


if __name__ == "__main__":
    sys.exit(main())
