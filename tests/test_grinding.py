"""Device-batched PoW grinding: the device search must return the same (first)
nonce as the host loop for every hasher mode, and the result must satisfy
check_pow (reference analog: winterfell grinding over the public-coin state)."""
import pytest

from certificate_stark_tpu.engine.coin import RandomCoin
from certificate_stark_tpu.engine.hasher import get_hasher


@pytest.mark.parametrize("hash_fn", ["rescue", "sha256", "blake3"])
def test_device_grind_matches_host(hash_fn):
    h = get_hasher(hash_fn)
    coin = RandomCoin(h, [3, 1, 4, 1, 5])
    coin.reseed(h.host_digest([9, 2, 6]))
    g = 11  # > 10 routes through the device path
    nonce_dev = coin._grind_device(g, 1 << 26, batch=1 << 12)
    assert coin.check_pow(nonce_dev, g)
    # host scan in the same order must find the identical first nonce
    nonce_host = next(n for n in range(nonce_dev + 1) if coin.check_pow(n, g))
    assert nonce_host == nonce_dev


def test_grind_dispatch_small_stays_host():
    h = get_hasher("rescue")
    coin = RandomCoin(h, [7])
    n = coin.grind(4)
    assert coin.check_pow(n, 4)
