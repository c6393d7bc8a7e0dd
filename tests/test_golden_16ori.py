"""16-orientation parity vs the COMPILED C++ experiment.

Goldens minted by tools/golden_gen/golden_gen_16.cpp, which compiles the
reference's test/ori_16bit_experiment/line2Dup_16bit_ori.cpp and dumps its
quantize/spread/response/linearize/similarity intermediates plus full
trained-and-matched cases. This replaces the round-2 oracle-only trust for
the 16-ori mode.

Documented finding (asserted below): the experiment does NOT vendor the
graded 8..0 table its LUT_gen.cpp emits (committed as LUT16.txt) — the
SIMILARITY_LUT it compiles maps circular bin distance d to 4 (d<=2),
1 (d in {3,4}), 0 (d>=5). The compiled table is the parity target.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from shape_based_matching_tpu import Detector
from shape_based_matching_tpu.models.template import Feature, Template
from shape_based_matching_tpu.ops import gradients, response, similarity
from shape_based_matching_tpu.oracle import reference as oracle
from .golden_utils import load_json, load_mat


def _dist(a: int, b: int) -> int:
    return min((a - b) % 16, (b - a) % 16)


def test_compiled_lut_semantics():
    """lut16_similarity.bin (the compiled SIMILARITY_LUT) must equal the
    {4,1,0}-by-distance formula that ops/response.py implements."""
    lut = load_mat("lut16_similarity.bin").reshape(-1).astype(int)
    assert lut.shape == (1024,)

    def w(d):
        return 4 if d <= 2 else (1 if d <= 4 else 0)

    for ori in range(16):
        for m in range(4):
            for n in range(16):
                want = max((w(_dist(4 * m + b, ori))
                            for b in range(4) if n >> b & 1), default=0)
                assert lut[ori * 64 + m * 16 + n] == want, (ori, m, n)


def test_lut16_txt_is_the_graded_table_not_the_compiled_one():
    """LUT16.txt (the committed LUT_gen.cpp output) is the graded
    8 - distance table — and it is NOT what the experiment compiles."""
    gen = load_mat("lut16_gen.bin").reshape(-1).astype(int)
    for ori in range(16):
        for m in range(4):
            for n in range(16):
                want = max((8 - _dist(4 * m + b, ori)
                            for b in range(4) if n >> b & 1), default=0)
                assert gen[ori * 64 + m * 16 + n] == want, (ori, m, n)
    compiled = load_mat("lut16_similarity.bin").reshape(-1).astype(int)
    assert (gen != compiled).sum() == 944  # measured at golden-mint time


def test_response_maps_16_match_compiled_lut():
    """response_maps(n_ori=16) must equal a direct evaluation of the
    compiled computeResponseMaps: max of the segment lookups, where the
    top segment's nibble is extracted as (s & (15 << 16)) >> 16 — always
    ZERO for a ushort (the reference's line2Dup_16bit_ori.cpp:639 bug),
    so bits 12..15 never contribute."""
    lut = load_mat("lut16_similarity.bin").reshape(16, 4, 16).astype(int)
    rng = np.random.RandomState(0)
    sample = np.concatenate([np.arange(4096), rng.randint(0, 1 << 16, 4096)])
    s = sample.astype(np.uint16).reshape(128, 64)
    got = np.asarray(response.response_maps(jnp.asarray(s), 16)).astype(int)
    for ori in range(16):
        seg = [lut[ori, m][(s >> (4 * m)) & 15] for m in range(3)]
        seg.append(lut[ori, 3][(s.astype(np.int64) & (15 << 16)) >> 16])
        want = np.maximum.reduce(seg)
        np.testing.assert_array_equal(got[ori], want)


@pytest.fixture(scope="module")
def kern16_img():
    return load_mat("kern16_img.bin")  # BGR color crop


def test_quantized16_golden(kern16_img):
    want = load_mat("kern16_quantized.bin", dtype=np.uint16)
    got = gradients.quantized_orientations(kern16_img, 30.0, n_ori=16)
    np.testing.assert_array_equal(np.asarray(got.angle), want)


@pytest.mark.parametrize("T", [4, 8])
def test_spread_response_linearize16_golden(T):
    quant = jnp.asarray(load_mat("kern16_quantized.bin", dtype=np.uint16))
    sp = response.spread(quant, T)
    np.testing.assert_array_equal(
        np.asarray(sp), load_mat(f"kern16_spread_T{T}.bin", dtype=np.uint16))
    resp = response.response_maps(sp, 16)
    np.testing.assert_array_equal(
        np.asarray(resp).reshape(-1, 128),
        load_mat(f"kern16_resp_T{T}.bin"))
    lm = response.linearize(resp, T)
    np.testing.assert_array_equal(
        np.asarray(lm).reshape(-1, lm.shape[-1]),
        load_mat(f"kern16_lm_T{T}.bin"))


@pytest.mark.parametrize("T", [4, 8])
def test_similarity16_golden(T):
    quant = jnp.asarray(load_mat("kern16_quantized.bin", dtype=np.uint16))
    lm_np = np.asarray(response.build_linear_memories(quant, T, n_ori=16))
    h, w = 128, 128
    M = (h // T) * (w // T)
    lmflat = jnp.concatenate([jnp.asarray(lm_np.reshape(-1)),
                              jnp.zeros((M,), jnp.uint8)])

    templ = load_json(f"kern16_templ_T{T}.json")
    feats = [tuple(f) for f in templ["features"]]
    bank = similarity.pack_level_bank(
        [{"features": feats, "width": 24, "height": 24}])

    S, _ = similarity.coarse_similarity(lmflat, bank, T, (w, h), n_ori=16)
    S = np.asarray(S).reshape(h // T, w // T)
    want16 = load_mat(f"kern16_sim_T{T}.bin", dtype=np.uint16).astype(int)
    np.testing.assert_array_equal(S, want16)
    # u8 path (<64 features, responses <= 4) must agree too
    want8 = load_mat(f"kern16_sim64_T{T}.bin").astype(int)
    np.testing.assert_array_equal(S, want8)

    # local similarity around (40, 40) — oracle path
    got = oracle.similarity_local(lm_np.reshape(16, T * T, M), feats,
                                  (w, h), T, (40, 40))
    want_l = load_mat(f"kern16_simlocal_T{T}.bin",
                      dtype=np.uint16).astype(int)
    np.testing.assert_array_equal(got.astype(int), want_l)
    want_l8 = load_mat(f"kern16_simlocal64_T{T}.bin").astype(int)
    np.testing.assert_array_equal(got.astype(int), want_l8)


def _detector_from_golden_templates() -> Detector:
    """Build a 16-ori Detector holding the templates the COMPILED
    experiment trained (its pre-fork trainer differs, so features are
    loaded, not re-trained). Ctor params mirror the experiment's
    Detector(int, vector<int>): weak=10, strong=55
    (line2Dup_16bit_ori.cpp:1051-1056)."""
    det = Detector(num_features=63, T=(4, 8), weak_threshold=10.0,
                   strong_threshold=55.0, num_orientations=16)
    doc = load_json("case16_train_templates.json")
    pyramids = []
    for tp in doc["templates"]:
        levels = []
        for t in tp:
            levels.append(Template(
                width=t["width"], height=t["height"],
                tl_x=t["tl_x"], tl_y=t["tl_y"],
                pyramid_level=t["pyramid_level"],
                features=[Feature(x, y, lbl) for x, y, lbl in
                          t["features"]]))
        pyramids.append(levels)
    det.class_templates["test"] = pyramids
    return det


def _assert_match_parity(ours, golden):
    # same contract as test_golden_matches (C++ dedup nondeterminism)
    ours_set = set((m.x, m.y, m.template_id, round(m.similarity, 3))
                   for m in ours)
    golden_set = set((m["x"], m["y"], m["template_id"],
                      round(m["similarity"], 3)) for m in golden)
    missing = golden_set - ours_set
    assert not missing, f"missing golden matches: {sorted(missing)[:10]}"
    extras = ours_set - golden_set
    golden_pos = set((g[0], g[1], g[3]) for g in golden_set)
    bad = [e for e in extras if (e[0], e[1], e[3]) not in golden_pos]
    assert not bad, f"extras not explained by C++ cross-tid dedup: {bad[:10]}"


def test_case16_match_parity_train_frame():
    det = _detector_from_golden_templates()
    img = load_mat("case16_img_train.bin")
    matches = det.match(img, 80.0, ["test"])
    want = load_json("case16_matches_train.json")["matches"]
    assert want  # the generator asserted non-empty
    _assert_match_parity(matches, want)


def test_case16_match_parity_test_frame():
    det = _detector_from_golden_templates()
    img = load_mat("case16_img.bin")
    matches = det.match(img, 30.0, ["test"])
    want = load_json("case16_matches.json")["matches"]
    assert len(want) >= 50
    _assert_match_parity(matches, want)
