"""Reference-pinned parity constants.

Every other test validates against self-built mirrors or closed-form
physics; this file pins CONVENTIONS bit-for-bit against matrices derived
directly from the reference's cirq decompositions (cirq itself is not
installed here, so the literals below were produced by hand-translating
the exact `_decompose_` bodies into an independent numpy engine using
cirq's documented gate semantics:

    rz(t) = exp(-i t Z / 2)        [cirq.rz, same for rx/ry]
    P**t  = (I+P)/2 + e^{i pi t} (I-P)/2   for a Pauli(-string) P
    CNOT/H/SWAP standard, qubit 0 = most significant bit,
    ops applied in list order (matrix product right-to-left)

and hard-coding the resulting unitaries at fixed parameter vectors.
If our gate library or circuit compiler ever drifts from cirq
conventions, these literals catch it, independent of any code path in
qmps_tpu.

Sources pinned:
- ShallowFullStateTensor (qmps/represent.py:382-404) at params 0.1..1.5
- StateGate              (qmps/represent.py:406-423) at params 0.1..0.6
- Vr environment ansatz  (qmps/ansatze.py:9-25)      at params 0.1..0.6
- ShallowQAOAStateTensor (qmps/represent.py:268-285), D=2, 2 layers
- ShallowCNOTStateTensor (qmps/represent.py:288-310), D=2, 2 layers
- the reference's ground-state accuracy gate E >= E_exact - 1e-3
  (reference tests/test_ground_state.py:218) is pinned in our
  tests/test_ground_state.py; the K/expYY/CPHASE closed forms
  (experiments/Jamie.py:38-146) in tests/test_core.py.
"""
import numpy as np
import jax.numpy as jnp

from qmps_tpu.circuits import ansatze

ATOL = 1e-10

P15 = jnp.arange(1, 16) * 0.1
P6 = jnp.arange(1, 7) * 0.1
P4 = jnp.arange(1, 5) * 0.1

SFST_15 = np.array([
    [-5.1250498649227316e-01+5.6795529201769668e-01j, -1.5076326294344761e-01-1.0444789462800314e-01j, -3.5757136311159576e-01-2.5305993970863555e-01j, -9.1144184697737551e-02+4.2535000380513910e-01j],
    [-3.1173262361123133e-01-2.0421413936261984e-02j, -2.8332193751987717e-01-2.5205455278640704e-01j, +5.5797146369620887e-01+1.5295284326098360e-01j, +6.2473036290917372e-01+1.8327074634919929e-01j],
    [-2.4025164165546378e-01-2.6710118865358806e-01j, +5.2268428049012727e-01+2.6919468333335062e-01j, -3.7928173431445122e-01-1.7470104358329386e-01j, +5.9193396957575761e-01+2.2595489458867357e-02j],
    [-4.8385502885170711e-02+4.3100592702559681e-01j, +6.3518331996782507e-01+2.7099035669609317e-01j, +5.4346218946758640e-01+6.0418711023121713e-02j, -1.4775442155283841e-01+1.1902171852531089e-01j],
])

STATE_GATE_6 = np.array([
    [+1.8886624647396252e-01+9.6369611354864326e-01j, +9.2876216764511965e-02-1.2080877361821566e-02j, +4.0631293699088314e-02+4.2180891310316824e-03j, -1.3684138865586559e-01-8.0331453882724224e-02j],
    [-1.0015219374473160e-02-5.2042873592210590e-02j, +2.7062752205503748e-02-1.5266382861688846e-01j, +9.7574360791732362e-01+1.0566455851955577e-01j, +2.9119744397320705e-03-9.9516484315198092e-02j],
    [+1.2513136735460277e-02-9.7208500128734096e-02j, +9.6047261935412998e-01+2.0258053694030245e-01j, +1.1791763642309994e-02-1.5558126684296977e-01j, -5.4098918007191880e-03-4.9734889405746593e-02j],
    [-1.5018118822566962e-01+2.5497371984397721e-02j, +4.5927148940856519e-02+3.9161130613612899e-02j, +8.7580361522743774e-02+5.5460097106466148e-02j, -4.7588882335549765e-01+8.5786728768152121e-01j],
])

VR_6 = np.array([
    [+7.7590893939189320e-01-1.3178178370346666e-01j, +4.5332837761001243e-01-2.4454591277725518e-01j, -7.8328377610012490e-02-3.2180016137099188e-01j, -6.2616552170528028e-02-4.0963967702796505e-02j],
    [+5.1049084255779542e-01-6.8617935463105822e-02j, -7.0518290703717701e-01+3.4945412913130125e-01j, +2.6579838744033666e-02-6.9945631943827441e-02j, +1.2578040041088881e-01+3.0638206453689421e-01j],
    [+1.3489902752028349e-01-9.6682183999329860e-02j, +1.6655578274030847e-01-2.4495619355316978e-01j, +5.1204728555283474e-01+5.2446469074064361e-01j, +5.1960946966719024e-01+2.7831781600067002e-01j],
    [+1.8149861670742221e-01-2.3409958918713861e-01j, -5.0264129073788362e-02+1.5817303707412345e-01j, +4.2526412907378841e-01+4.0817303707412345e-01j, -6.5702687485499900e-01-3.2491740518780882e-01j],
])

QAOA_D2_4 = np.array([
    [+2.7950849718747350e-01+6.2247457122069494e-01j, +4.5225424859373686e-01+9.0817816000670182e-02j, +4.5225424859373681e-01+9.0817816000670168e-02j, -2.9508497187473656e-02-3.2858194507445848e-01j],
    [+2.2612712429686835e-01+4.0205510161101765e-01j, -6.7838137289060518e-01-7.3473156536559059e-02j, +3.2161862710939471e-01-7.3473156536559073e-02j, +2.2612712429686838e-01+4.0205510161101754e-01j],
    [+2.2612712429686832e-01+4.0205510161101754e-01j, +3.2161862710939471e-01-7.3473156536559073e-02j, -6.7838137289060518e-01-7.3473156536559059e-02j, +2.2612712429686840e-01+4.0205510161101754e-01j],
    [-2.9508497187473663e-02-3.2858194507445854e-01j, +4.5225424859373681e-01+9.0817816000670168e-02j, +4.5225424859373681e-01+9.0817816000670112e-02j, +2.7950849718747361e-01+6.2247457122069494e-01j],
])

CNOT_D2_4 = np.array([
    [+3.6393975055453565e-01-4.5654030239567178e-01j, +4.1859801340904990e-01-1.8544823536259045e-01j, +3.7819526647202600e-01-1.2683513185598094e-01j, -5.2120164010171954e-01-1.3687039682186786e-01j],
    [+3.9270557224932162e-01-7.0008169374036144e-02j, +4.5747497702666656e-01-2.8478290076012108e-01j, -5.3826425903596331e-01-2.2616979725351161e-01j, +4.5470565732448853e-01+5.3461294655167607e-02j],
    [-4.4738574222430194e-01-3.7513622512314054e-01j, +4.1859801340904990e-01+1.8544823536259045e-01j, +3.7819526647202611e-01+1.2683513185598103e-01j, +5.3800425792198980e-01-3.0595320372683789e-02j],
    [+3.9878608245330605e-01-9.4058862589226425e-03j, -4.5747497702666656e-01-2.8478290076012114e-01j, +5.3826425903596331e-01-2.2616979725351158e-01j, +4.5626293713164345e-01+3.7940440549732155e-02j],
])


class TestReferenceParity:
    def test_shallow_full_state_tensor(self):
        """15-param SU(4) decomposition (qmps/represent.py:382-404),
        params [0.1, ..., 1.5], pinned bit-for-bit."""
        np.testing.assert_allclose(
            np.asarray(ansatze.shallow_full_state(P15)), SFST_15, atol=ATOL
        )

    def test_state_gate(self):
        """6-param XX/YY StateGate (qmps/represent.py:406-423)."""
        np.testing.assert_allclose(
            np.asarray(ansatze.state_gate(P6)), STATE_GATE_6, atol=ATOL
        )

    def test_env_vr(self):
        """Vr environment ansatz (qmps/ansatze.py:9-25)."""
        np.testing.assert_allclose(
            np.asarray(ansatze.env_vr(P6)), VR_6, atol=ATOL
        )

    def test_shallow_qaoa_d2(self):
        """ShallowQAOAStateTensor, D=2, two (beta, gamma) layers
        (qmps/represent.py:268-285)."""
        np.testing.assert_allclose(
            np.asarray(ansatze.shallow_qaoa_state(2, P4)), QAOA_D2_4, atol=ATOL
        )

    def test_shallow_cnot_d2(self):
        """ShallowCNOTStateTensor, D=2, two layers (qmps/represent.py:288-310)
        — the production Loschmidt ansatz."""
        np.testing.assert_allclose(
            np.asarray(ansatze.shallow_cnot_state(2, P4)), CNOT_D2_4, atol=ATOL
        )

    def test_pinned_matrices_are_unitary(self):
        """Sanity on the literals themselves (guards transcription typos)."""
        for M in (SFST_15, STATE_GATE_6, VR_6, QAOA_D2_4, CNOT_D2_4):
            np.testing.assert_allclose(M @ M.conj().T, np.eye(4), atol=1e-14)
