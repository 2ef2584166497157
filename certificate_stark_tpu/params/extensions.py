"""Extension-field towers over f63 for the quadratic/cubic proof options
(reference tests sweep FieldExtension::None/Quadratic/Cubic, src/tests.rs:40-54;
the example CLI defaults to Cubic, examples/state-transition.rs:63-67).

The winterfell fork's exact tower definitions are unavailable (fork not
vendored); these are our own, verified irreducible by scripts (see git log):

  quadratic: f63[x] / (x^2 - 3)        (3 is the smallest non-residue;
                                        p = 1 mod 8 so 2 is a residue)
  cubic:     f63[x] / (x^3 - 3x - 1)   (binomials are all reducible since
                                        gcd(3, p-1) = 1; smallest trinomial)
"""

QUAD_NONRESIDUE = 3          # x^2 = 3
CUBIC_A1 = 3                 # x^3 = 3x + 1
CUBIC_A0 = 1
