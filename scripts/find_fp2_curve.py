#!/usr/bin/env python
"""Search for a curve E: y^2 = x^3 + x + b with b in F_{p^2} \\ F_p whose
F_{p^6} group order carries a >=250-bit prime factor — the reference-strength
Schnorr scalar field (reference ecc.rs:23-45, schnorr/mod.rs:197-245 use a
~254-bit scalar group; for b in F_p the primitive part caps at ~126 bits,
see DESIGN.md "curve question").

Per candidate b = (b0, b1):
  1. native/fp2_count (parallel Pollard kangaroo, ~2^33.5 group ops) finds
     the F_{p^2} trace t2.
  2. N2 = p^2+1-t2 ; s6 = t2^3 - 3 p^2 t2 ; N6 = p^6+1-s6 ; M = N6/N2.
  3. Strip factors < 2^20 from M; if the remainder is a >=250-bit probable
     prime, that's the scalar field q.
State is appended to scripts/fp2_search_state.jsonl (resumable); on success
writes the instance summary to scripts/fp2_found.json (generator derivation:
scripts/gen_subfield_generator.py pattern, adapted by the caller).
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
from certificate_stark_tpu.params.data import P  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
STATE = os.path.join(HERE, "fp2_search_state.jsonl")
FOUND = os.path.join(HERE, "fp2_found.json")
COUNTER = os.path.join(HERE, "..", "native", "fp2_count")


def is_probable_prime(n, rounds=40):
    if n < 2:
        return False
    for sp in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % sp == 0:
            return n == sp
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    import random
    rng = random.Random(0xC0FFEE ^ n)
    for _ in range(rounds):
        a = rng.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def strip_small(n, bound=1 << 20):
    fac = {}
    for q in (2, 3, 5, 7, 11, 13):
        while n % q == 0:
            n //= q
            fac[q] = fac.get(q, 0) + 1
    f = 17
    while f < bound and f * f <= n:
        while n % f == 0:
            n //= f
            fac[f] = fac.get(f, 0) + 1
        f += 2
    return n, fac


def analyse(b0, b1, t2):
    n2 = P * P + 1 - t2
    s6 = t2 ** 3 - 3 * (P * P) * t2
    n6 = P ** 6 + 1 - s6
    if n6 % n2 != 0:
        return {"error": "N2 does not divide N6"}
    m = n6 // n2
    core, small = strip_small(m)
    rec = {"b0": b0, "b1": b1, "t2": t2, "n2": str(n2), "m_bits": m.bit_length(),
           "core_bits": core.bit_length(), "small": small}
    # M ~ p^4 ~ 2^248.1, so 248-249-bit primes are the ceiling for fp2-b
    # curves (the reference's 254-bit scalar needs the unvendored fork's b);
    # accept cofactor <= 8 within M
    if core.bit_length() >= 246 and is_probable_prime(core):
        rec["prime_q"] = str(core)
        rec["cofactor"] = str(n6 // core)
        rec["n6"] = str(n6)
        rec["hit"] = True
    return rec


def candidates():
    # deterministic sparse candidates; b1 != 0 keeps b outside F_p
    i = 0
    while True:
        yield (3 + i, 1)
        yield (5, 2 + i)
        i += 1


def main():
    done = set()
    if os.path.exists(STATE):
        for line in open(STATE):
            r = json.loads(line)
            done.add((r["b0"], r["b1"]))
    threads = os.environ.get("FP2_THREADS", "4")
    for b0, b1 in candidates():
        if (b0, b1) in done:
            continue
        t0 = time.time()
        seed = 1000 + b0 * 17 + b1
        for attempt in range(4):
            out = subprocess.run(
                [COUNTER, str(b0), str(b1), str(seed + attempt * 101), threads],
                capture_output=True, text=True)
            line = out.stdout.strip()
            if line.startswith("t2 "):
                t2 = int(line.split()[1])
                rec = analyse(b0, b1, t2)
                rec["wall_s"] = round(time.time() - t0, 1)
                with open(STATE, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(json.dumps(rec), flush=True)
                if rec.get("hit"):
                    with open(FOUND, "w") as f:
                        json.dump(rec, f, indent=1)
                    return 0
                break
            print(f"# b=({b0},{b1}) attempt {attempt}: {line!r} "
                  f"{out.stderr.strip()!r}", flush=True)
        else:
            with open(STATE, "a") as f:
                f.write(json.dumps({"b0": b0, "b1": b1,
                                    "error": "count failed"}) + "\n")
    return 1


if __name__ == "__main__":
    sys.exit(main())
