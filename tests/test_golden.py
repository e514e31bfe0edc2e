"""Golden-proof fixture: locks the wire format, the transcript byte
sequence, the device RNG (threefry salts/mask), and every field kernel to an
exact reference output. Any change to proof bytes — intended or not — fails
here first.

Regenerate after an INTENTIONAL format/protocol change:
    python - <<'EOF'
    import hashlib
    from toyni_tpu.prover import StarkProver
    from toyni_tpu.trace import ExecutionTrace
    from toyni_tpu import proof as proof_mod
    from toyni_tpu.field.babybear import P
    out, a, b = [], 1, 1
    for _ in range(64): out.append(a); a, b = b, (a + b) % P
    t = ExecutionTrace(); t.insert_column(out)
    blob = proof_mod.serialize(StarkProver(t, seed=96).generate_proof())
    print(hashlib.sha256(blob).hexdigest())
    EOF
"""

import hashlib

from toyni_tpu.field.babybear import P
from toyni_tpu.prover import StarkProver
from toyni_tpu.trace import ExecutionTrace
from toyni_tpu import proof as proof_mod

GOLDEN_SHA256 = "c71dd20794b4fae75bac1d5e608819b64893fd58bf7407945b3ba986985f42e8"
GOLDEN_T_Z = 1739385554
GOLDEN_TRACE_ROOT = "dfe84c96deb33cac1bdc33b3c3ba5830b8f2738d81994bfa8aa7ef1bb3db9b56"


def test_golden_proof_bytes():
    out, a, b = [], 1, 1
    for _ in range(64):
        out.append(a)
        a, b = b, (a + b) % P
    t = ExecutionTrace()
    t.insert_column(out)
    proof = StarkProver(t, seed=96).generate_proof()
    assert proof.t_z == GOLDEN_T_Z
    assert proof.trace_commitment.hex() == GOLDEN_TRACE_ROOT
    blob = proof_mod.serialize(proof)
    assert hashlib.sha256(blob).hexdigest() == GOLDEN_SHA256
