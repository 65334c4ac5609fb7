"""Contrastively pretrain the sentence TextTower for E1 evidence re-ranking.

Fills the MiniLM-L6-v2 role (reference `e1_web_evidence.py:330-354`): E1
embeds the claim and each search result's "title snippet" string and ranks
by cosine.  Without a trained checkpoint the factory falls back to the
deterministic lexical HashingTextEncoder; this trainer produces
``checkpoints/text_encoder.npz`` so ranking is semantic instead.

Training pairs are claim-style sentences vs re-styled paraphrases of the
SAME fact (synonym substitution, attribution reordering, digit<->word
numbers, headline/snippet framing — the transformations between a spoken
claim and how coverage of it is titled).  In-batch negatives share
templates and topics, so slot values (who/where/how-much) are what
separates positives from negatives — the encoder must read content words,
not sentence shape.  Symmetric InfoNCE, same recipe as the CLIP towers.

    python tools/pretrain_text_encoder.py --steps 3000 --batch 64
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# ---------------------------------------------------------------------------
# Claim generator: one underlying fact -> (claim rendering, coverage rendering)
# ---------------------------------------------------------------------------
SYN = {
    "said": ["said", "stated", "announced", "declared", "told reporters"],
    "will": ["will", "plans to", "intends to", "is going to"],
    "cut": ["cut", "reduce", "lower", "slash"],
    "raise": ["raise", "increase", "boost", "hike"],
    "rose": ["rose", "climbed", "increased", "went up"],
    "fell": ["fell", "dropped", "declined", "went down"],
    "reported": ["reported", "confirmed", "recorded", "registered"],
    "found": ["found", "discovered", "detected", "identified"],
    "percent": ["percent", "per cent", "%"],
    "about": ["about", "around", "approximately", "roughly", "nearly"],
}

WORDS_0_20 = (
    "zero one two three four five six seven eight nine ten eleven twelve "
    "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
).split()

OFFICIALS = ["mayor", "governor", "senator", "council chair", "police chief",
             "health director", "school superintendent", "fire marshal"]
CITIES = ["riverton", "lakeside", "fairview", "oakdale", "mill valley",
          "cedar falls", "port hughes", "granite bay", "summit", "brookfield"]
THINGS = ["property taxes", "transit fares", "water rates", "parking fines",
          "school funding", "park budgets", "housing permits", "road tolls"]
RIVERS = ["bear", "salt", "copper", "willow", "stone", "fox", "elk", "pine"]
DISEASES = ["measles", "influenza", "whooping cough", "salmonella", "mumps"]
ORGS = ["the county health office", "state regulators", "the water authority",
        "federal inspectors", "the transit agency", "university researchers"]
COMPANIES = ["northline motors", "vexa labs", "harbor steel", "bluepeak air",
             "orchard foods", "quanta textiles"]
AGENCIES = ["the space agency", "the weather service", "the geological survey",
            "the fisheries board"]
PHENOMENA = ["a new fault line", "record ocean temperatures", "a meteor shower",
             "an unusual algae bloom", "a magnetic anomaly"]


def _num(rng) -> int:
    return int(rng.choice([2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 15, 18, 20, 25,
                           30, 40, 50, 75, 100, 200, 500]))


def make_fact(rng: np.random.RandomState) -> dict:
    """A structured fact; renderings below restyle it without changing it."""
    kind = int(rng.randint(5))
    f = {"kind": kind, "num": _num(rng)}
    if kind == 0:   # policy: official says city will cut/raise thing by N%
        f.update(who=rng.choice(OFFICIALS), where=rng.choice(CITIES),
                 verb=rng.choice(["cut", "raise"]), what=rng.choice(THINGS))
    elif kind == 1:  # flood: river rose/fell N feet
        f.update(river=rng.choice(RIVERS), verb=rng.choice(["rose", "fell"]))
    elif kind == 2:  # health: org reported N cases of disease in city
        f.update(org=rng.choice(ORGS), disease=rng.choice(DISEASES),
                 where=rng.choice(CITIES))
    elif kind == 3:  # economy: company to add/cut N jobs in city
        f.update(company=rng.choice(COMPANIES), where=rng.choice(CITIES),
                 verb=rng.choice(["add", "eliminate"]))
    else:            # science: agency found phenomenon
        f.update(agency=rng.choice(AGENCIES), what=rng.choice(PHENOMENA))
    return f


def _syn(rng, key: str) -> str:
    return str(rng.choice(SYN[key]))


def _fmt_num(rng, n: int) -> str:
    if n <= 20 and rng.rand() < 0.5:
        return WORDS_0_20[n]
    return str(n)


def render_fact(rng: np.random.RandomState, f: dict) -> str:
    """One spoken/written rendering of the fact.  Repeated calls with the
    same fact give paraphrases: synonyms, attribution order and number
    format vary; the slot values never do."""
    n = _fmt_num(rng, f["num"])
    k = f["kind"]
    if k == 0:
        core = f"{_syn(rng, f['verb'])} {f['what']} by {n} {_syn(rng, 'percent')}"
        attrib = f"the {f['who']} of {f['where']}"
        style = rng.randint(3)
        if style == 0:
            return f"{attrib} {_syn(rng, 'said')} the city {_syn(rng, 'will')} {core}"
        if style == 1:
            return f"according to {attrib}, the city {_syn(rng, 'will')} {core}"
        return f"the city {_syn(rng, 'will')} {core}, the {f['who']} {_syn(rng, 'said')}"
    if k == 1:
        lead = f"the {f['river']} river"
        if rng.rand() < 0.5:
            return f"{lead} {_syn(rng, f['verb'])} {n} feet overnight"
        return f"water levels on {lead} {_syn(rng, f['verb'])} by {n} feet"
    if k == 2:
        if rng.rand() < 0.5:
            return (f"{f['org']} {_syn(rng, 'reported')} {n} new cases of "
                    f"{f['disease']} in {f['where']}")
        return (f"{n} {f['disease']} cases were {_syn(rng, 'reported')} "
                f"in {f['where']} by {f['org']}")
    if k == 3:
        verb = "add" if f["verb"] == "add" else str(rng.choice(["eliminate", "cut"]))
        if rng.rand() < 0.5:
            return f"{f['company']} {_syn(rng, 'will')} {verb} {n} jobs in {f['where']}"
        past = {"add": "added", "eliminate": "eliminated", "cut": "cut"}[verb]
        return (f"{_syn(rng, 'about')} {n} jobs in {f['where']} "
                f"will be {past} by {f['company']}")
    if rng.rand() < 0.5:
        return f"{f['agency']} {_syn(rng, 'found')} {f['what']}"
    return f"{f['what']} was {_syn(rng, 'found')} by {f['agency']}"


TITLE_STYLES = ["Fact check: {s}", "AP verification: {s}", "Reality Check: {s}",
                "Rating: {s}", "What we know: {s}", "{s}"]
SNIPPET_STYLES = [
    "Coverage of the claim '{s}' with sourcing and context.",
    "Officials respond after reports that {s}.",
    "Our reporters examined whether {s}.",
    "New details emerge: {s}.",
]


def render_doc(rng: np.random.RandomState, f: dict) -> str:
    """A search-result-style rendering: '{title} {snippet}' — the exact
    string shape E1 embeds (nodes/e1_evidence.py rank_results)."""
    title = str(rng.choice(TITLE_STYLES)).format(s=render_fact(rng, f))
    if rng.rand() < 0.7:
        snippet = str(rng.choice(SNIPPET_STYLES)).format(s=render_fact(rng, f))
        return f"{title} {snippet}"
    return title


def make_batch(rng: np.random.RandomState, batch: int, tok, max_len: int):
    """(query ids, doc ids).  Facts in a batch reuse topics/templates, so
    negatives are same-shaped sentences with different slot values."""
    q_ids = np.zeros((batch, max_len), np.int32)
    d_ids = np.zeros((batch, max_len), np.int32)
    seen = set()
    for i in range(batch):
        while True:
            f = make_fact(rng)
            key = json.dumps(f, sort_keys=True)
            if key not in seen:
                seen.add(key)
                break
        q_ids[i] = tok.encode(render_fact(rng, f), max_len)
        d_ids[i] = tok.encode(render_doc(rng, f), max_len)
    return q_ids, d_ids


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------
def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dim", type=int, default=192)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--out-dim", type=int, default=256)
    ap.add_argument("--out", default="checkpoints/text_encoder.npz")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        import fvd_tpu

        fvd_tpu.force_cpu()
    import jax.numpy as jnp
    import optax

    from fvd_tpu.models.encoders import MAX_TEXT_LEN, TextTower, save_params
    from fvd_tpu.models.transformer import ByteTokenizer

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.RandomState(args.seed)
    tok = ByteTokenizer()
    model = TextTower(dim=args.dim, depth=args.depth, out_dim=args.out_dim)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, MAX_TEXT_LEN), jnp.int32))
    if args.resume and os.path.exists(args.out):
        from fvd_tpu.models.encoders import load_params

        params = load_params(args.out, params)
        print(f"[text] resumed params from {args.out}")
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    def loss_fn(params, q_ids, d_ids):
        q = model.apply(params, q_ids)
        d = model.apply(params, d_ids)
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        logits = (q @ d.T) / 0.07
        labels = jnp.arange(logits.shape[0])
        lq = -jnp.mean(jax.nn.log_softmax(logits, axis=1)[labels, labels])
        ld = -jnp.mean(jax.nn.log_softmax(logits, axis=0)[labels, labels])
        return (lq + ld) / 2

    @jax.jit
    def step(params, opt_state, q_ids, d_ids):
        loss, grads = jax.value_and_grad(loss_fn)(params, q_ids, d_ids)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    for i in range(args.steps):
        q_ids, d_ids = make_batch(rng, args.batch, tok, MAX_TEXT_LEN)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(q_ids),
                                       jnp.asarray(d_ids))
        if i % 100 == 0 or i == args.steps - 1:
            print(f"[text] step {i:4d} loss {float(loss):.3f} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)

    # eval on a held-out seed: retrieval@1 over a fresh batch
    eval_rng = np.random.RandomState(args.seed + 10_000)
    accs = []
    for _ in range(4):
        q_ids, d_ids = make_batch(eval_rng, 64, tok, MAX_TEXT_LEN)
        q = np.array(model.apply(params, jnp.asarray(q_ids)))
        d = np.array(model.apply(params, jnp.asarray(d_ids)))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        accs.append(((q @ d.T).argmax(axis=1) == np.arange(len(q))).mean())
    print(f"[text] eval retrieval@1 (64-way, held-out seed): {np.mean(accs):.3f}")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_params(args.out, params)
    with open(args.out.replace(".npz", ".json"), "w") as fh:
        json.dump({"dim": args.dim, "depth": args.depth,
                   "out_dim": args.out_dim,
                   "eval_retrieval_at_1": float(np.mean(accs))}, fh)
    print(f"[text] saved {args.out} (dim={args.dim}, depth={args.depth})")


if __name__ == "__main__":
    main()
