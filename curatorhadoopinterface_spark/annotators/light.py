"""Per-document annotator implementations.

Each function takes raw text (plus already-computed dependency views)
and returns plain-Python span/tree payloads matching ``schema.py``
structs. They are loaded once per Python worker (module import = the
reference's per-node annotator launch, CuratorReducer.java:931-1045,
minus the warmup sleeps) and applied over Arrow record batches.

POS rules are ordered and intentionally SQL-expressible — the DuckDB
oracle replicates them as a CASE chain, giving the pandas-UDF pipeline
a value-level correctness check (the reference's verifyRecords pattern,
CuratorClient.java:660-853).
"""

from __future__ import annotations

import re

# Parity with illinoistokenizer-0.4 on the samplejob corpus (golden test
# asserts EXACT token+sentence counts on all 4 docs): ellipsis and
# em-dash are single tokens, intra-word hyphens keep compounds together
# (mast-head), an apostrophe glues to the following letters ('s), and a
# sentence terminator may be followed by closing quotes/brackets.
TOKEN_RE = re.compile(
    r"\.\.\.|--|[A-Za-z0-9]+(?:-[A-Za-z0-9]+)*|'[A-Za-z]+|[^A-Za-z0-9\s]"
)
SENT_END_RE = re.compile(r"[.!?]+[\"')\]]*(?:\s+|$)")

DT_WORDS = frozenset({"the", "a", "an"})
CC_WORDS = frozenset({"and", "or", "but"})
IN_WORDS = frozenset({"of", "in", "on", "at", "by", "for", "with", "from", "to"})
VB_WORDS = frozenset(
    {"is", "are", "was", "were", "be", "been", "am", "has", "have", "had", "do", "does", "did"}
)

# gazetteer NER (the reference's NER is a dictionary+model server; ours is
# the dictionary part, with the same BIO->span merge shape,
# IllinoisNERHandler.java:150-189)
GAZETTEER = {
    "spark": "TECH",
    "hadoop": "TECH",
    "hash": "TECH",
    "vector": "TECH",
    "customer": "ROLE",
    "supplier": "ROLE",
    "lorem": "MISC",
    "ipsum": "MISC",
}


def _span(start: int, ending: int, label: str, source: str, score: float = 1.0, attributes=None):
    return {
        "start": start,
        "ending": ending,
        "label": label,
        "score": score,
        "source": source,
        "attributes": attributes,
    }


def tokenize(text: str, source: str = "enginetok-1.0") -> list[dict]:
    """TOKEN: alnum runs (hyphen-joined compounds stay whole), ellipsis/
    em-dash/apostrophe-clitic tokens, else single punctuation chars —
    half-open char offsets (Span semantics, curator.thrift Span);
    token-for-token equal to illinoistokenizer-0.4 on the samplejob
    golden corpus (tests/test_thrift_interop.py)."""
    return [_span(m.start(), m.end(), m.group(0), source) for m in TOKEN_RE.finditer(text)]


def sentence_spans(text: str, source: str = "enginesent-1.0") -> list[dict]:
    """SENTENCE: split after [.!?]+ runs; unterminated tail is a sentence."""
    out = []
    pos = 0
    for m in SENT_END_RE.finditer(text):
        seg = text[pos : m.end()].strip()
        if seg:
            out.append(_span(pos, m.end(), seg[:20], source))
        pos = m.end()
    tail = text[pos:].strip()
    if tail:
        out.append(_span(pos, len(text), tail[:20], source))
    return out


def pos_tag_word(tok: str) -> str:
    """Ordered POS-lite rules (SQL-replicable; see operators/spans.py)."""
    lo = tok.lower()
    if not re.match(r"^[A-Za-z0-9]", tok):
        return "PUNCT"
    if re.fullmatch(r"[0-9]+", tok):
        return "CD"
    if lo in DT_WORDS:
        return "DT"
    if lo in CC_WORDS:
        return "CC"
    if lo in IN_WORDS:
        return "IN"
    if lo in VB_WORDS:
        return "VB"
    if len(tok) > 4 and lo.endswith("ing"):
        return "VBG"
    if len(tok) > 3 and lo.endswith("ed"):
        return "VBD"
    if len(tok) > 3 and lo.endswith("ly"):
        return "RB"
    if tok[0].isupper():
        return "NNP"
    if len(tok) > 3 and lo.endswith("s") and not lo.endswith("ss"):
        return "NNS"
    return "NN"


def pos_tag(text: str, tokens: list[dict], source: str = "enginepos-1.0") -> list[dict]:
    """POS: one span per token, label = tag (depends on TOKEN)."""
    return [
        _span(t["start"], t["ending"], pos_tag_word(text[t["start"] : t["ending"]]), source)
        for t in tokens
    ]


NP_TAGS = frozenset({"DT", "CD", "NN", "NNS", "NNP"})
VP_TAGS = frozenset({"VB", "VBD", "VBG", "RB"})


def chunk_spans(pos: list[dict], source: str = "enginechunk-1.0") -> list[dict]:
    """CHUNK: maximal runs of NP-ish / VP-ish POS tags -> one chunk span
    (BIO-merge shape of the reference chunker)."""
    out = []
    run_start = run_end = None
    run_kind = None

    def kind_of(tag: str) -> str | None:
        if tag in NP_TAGS:
            return "NP"
        if tag in VP_TAGS:
            return "VP"
        return None

    for p in pos:
        k = kind_of(p["label"])
        if k is not None and k == run_kind:
            run_end = p["ending"]
        else:
            if run_kind is not None:
                out.append(_span(run_start, run_end, run_kind, source))
            run_kind, run_start, run_end = k, p["start"], p["ending"]
    if run_kind is not None:
        out.append(_span(run_start, run_end, run_kind, source))
    return out


def ner_spans(text: str, source: str = "enginener-1.0") -> list[dict]:
    """NER: gazetteer match over our own tokenization (the reference NER
    also re-tokenizes, CuratorReducer config requires nothing); adjacent
    same-type tokens merge into one span (BIO->span semantics)."""
    out = []
    cur = None
    for m in TOKEN_RE.finditer(text):
        typ = GAZETTEER.get(m.group(0).lower())
        if typ is not None and cur is not None and cur[2] == typ and m.start() == cur[1] + 1:
            cur = (cur[0], m.end(), typ)
        else:
            if cur is not None:
                out.append(_span(cur[0], cur[1], cur[2], source))
            cur = (m.start(), m.end(), typ) if typ is not None else None
    if cur is not None:
        out.append(_span(cur[0], cur[1], cur[2], source))
    return out


def wiki_spans(text: str, ner: list[dict], source: str = "enginewiki-1.0") -> list[dict]:
    """WIKI: one span per NER span with an attributes map (the reference
    wikifier emits attribute maps, CuratorClient.java:1167-1175)."""
    out = []
    for s in ner:
        surface = text[s["start"] : s["ending"]]
        slug = surface.title().replace(" ", "_")
        out.append(
            _span(
                s["start"],
                s["ending"],
                s["label"],
                source,
                attributes={"url": f"https://en.wikipedia.org/wiki/{slug}"},
            )
        )
    return out


def coref_clusters(text: str, ner: list[dict], source: str = "enginecoref-1.0") -> list[dict]:
    """COREF: mentions with identical lowercase surface form cluster
    together (Clustering = list of span-groups,
    IllinoisCorefHandler.java:120-197 shape)."""
    groups: dict[str, list[dict]] = {}
    for s in ner:
        key = text[s["start"] : s["ending"]].lower()
        groups.setdefault(key, []).append(_span(s["start"], s["ending"], key, source))
    clusters = [{"labels": spans} for _, spans in sorted(groups.items())]
    return clusters


def _flat_tree(sent: dict, tokens: list[dict], source: str) -> dict:
    """One flat constituency tree per sentence: root S node + one child
    node per token (Node.children: child-index -> edge label)."""
    toks = [t for t in tokens if t["start"] >= sent["start"] and t["ending"] <= sent["ending"]]
    nodes = [
        {
            "label": "S",
            "span": _span(sent["start"], sent["ending"], "S", source),
            "children": {i + 1: "child" for i in range(len(toks))},
        }
    ]
    for t in toks:
        nodes.append(
            {
                "label": "TOK",
                "span": _span(t["start"], t["ending"], t["label"], source),
                "children": {},
            }
        )
    return {"top": 0, "nodes": nodes, "score": 1.0}


def parse_forest(text: str, tokens: list[dict], sentences: list[dict] | None, source: str = "engineparse-1.0") -> dict:
    """PARSE (charniak-lite): one flat tree per sentence."""
    sents = sentences or [_span(0, len(text), "S", source)]
    return {"trees": [_flat_tree(s, tokens, source) for s in sents], "source": source}


def dep_forest(text: str, tokens: list[dict], sentences: list[dict] | None, source: str = "enginestanford-1.0") -> dict:
    """stanfordDep-lite: left-to-right chain dependencies per sentence."""
    sents = sentences or [_span(0, len(text), "S", source)]
    trees = []
    for sent in sents:
        toks = [t for t in tokens if t["start"] >= sent["start"] and t["ending"] <= sent["ending"]]
        nodes = []
        for i, t in enumerate(toks):
            children = {i + 1: "dep"} if i + 1 < len(toks) else {}
            nodes.append(
                {
                    "label": "W",
                    "span": _span(t["start"], t["ending"], t["label"], source),
                    "children": children,
                }
            )
        trees.append({"top": 0 if nodes else -1, "nodes": nodes, "score": 1.0})
    return {"trees": trees, "source": source}


def srl_forest(
    text: str,
    pos: list[dict],
    chunks: list[dict],
    nominal: bool = False,
    source: str = "enginesrl-1.0",
) -> dict:
    """SRL-lite: one tree per predicate; ARG0 = nearest NP chunk left of
    the predicate, ARG1 = nearest NP right (Forest-of-predicates shape
    the reference SRL emits)."""
    if nominal:
        preds = [p for p in pos if p["label"] == "NNS"]
    else:
        preds = [p for p in pos if p["label"].startswith("VB") or p["label"] == "VB"]
    nps = [c for c in chunks if c["label"] == "NP"]
    trees = []
    for pred in preds:
        left = [c for c in nps if c["ending"] <= pred["start"]]
        right = [c for c in nps if c["start"] >= pred["ending"]]
        nodes = [
            {
                "label": "PRED",
                "span": _span(pred["start"], pred["ending"], pred["label"], source),
                "children": {},
            }
        ]
        idx = 1
        children = {}
        if left:
            arg = left[-1]
            nodes.append(
                {"label": "ARG0", "span": _span(arg["start"], arg["ending"], "NP", source), "children": {}}
            )
            children[idx] = "ARG0"
            idx += 1
        if right:
            arg = right[0]
            nodes.append(
                {"label": "ARG1", "span": _span(arg["start"], arg["ending"], "NP", source), "children": {}}
            )
            children[idx] = "ARG1"
        nodes[0]["children"] = children
        trees.append({"top": 0, "nodes": nodes, "score": 1.0})
    return {"trees": trees, "source": source}


def annotate_record(text: str, views: dict, modes: list[str]) -> dict:
    """Compute the requested modes for one document, reusing any views
    already in ``views`` (per-row memoization — the Curator's
    provide-with-requirements loop, CuratorHandler.java:1029-1052).

    ``views`` maps view name -> payload; mutated in place and returned.
    Missing requirements are computed first (the recursive-provide
    semantics of CuratorHandler.provide, :1036-1045) — callers may
    request any mode without pre-expanding its dependency closure.
    """
    from curatorhadoopinterface_spark.plans.registry import MODES, dependency_closure

    expanded: list[str] = []
    for m in modes:
        for dep in dependency_closure(m):
            if dep not in expanded:
                expanded.append(dep)
    modes = expanded

    def lab(view: str) -> list[dict]:
        return views[view]["labels"]

    for mode_name in modes:
        mode = MODES[mode_name]
        if mode.view in views:
            continue
        src = mode.version
        if mode_name == "TOKEN":
            views["tokens"] = {"labels": tokenize(text, src), "source": src, "score": 1.0}
        elif mode_name == "SENTENCE":
            views["sentences"] = {"labels": sentence_spans(text, src), "source": src, "score": 1.0}
        elif mode_name == "POS":
            views["pos"] = {"labels": pos_tag(text, lab("tokens"), src), "source": src, "score": 1.0}
        elif mode_name == "CHUNK":
            views["chunk"] = {"labels": chunk_spans(lab("pos"), src), "source": src, "score": 1.0}
        elif mode_name == "NER":
            views["ner"] = {"labels": ner_spans(text, src), "source": src, "score": 1.0}
        elif mode_name == "WIKI":
            views["wikifier"] = {"labels": wiki_spans(text, lab("ner"), src), "source": src, "score": 1.0}
        elif mode_name == "COREF":
            views["coref"] = {
                "clusters": coref_clusters(text, lab("ner"), src),
                "source": src,
                "score": 1.0,
            }
        elif mode_name == "PARSE":
            views["charniak"] = parse_forest(text, lab("tokens"), views.get("sentences", {}).get("labels"), src)
        elif mode_name == "STANFORD_PARSE":
            views["stanfordParse"] = parse_forest(text, lab("tokens"), lab("sentences"), src)
            views["stanfordDep"] = dep_forest(text, lab("tokens"), lab("sentences"), src)
        elif mode_name == "VERB_SRL":
            views["srl"] = srl_forest(text, lab("pos"), lab("chunk"), False, src)
        elif mode_name == "NOM_SRL":
            views["nom"] = srl_forest(text, lab("pos"), lab("chunk"), True, "enginenom-1.0")
        else:
            raise KeyError(f"no annotator for mode {mode_name}")
    return views


ANNOTATORS = {
    "TOKEN": tokenize,
    "SENTENCE": sentence_spans,
    "POS": pos_tag,
    "CHUNK": chunk_spans,
    "NER": ner_spans,
    "WIKI": wiki_spans,
    "COREF": coref_clusters,
    "PARSE": parse_forest,
    "STANFORD_PARSE": dep_forest,
    "VERB_SRL": srl_forest,
    "NOM_SRL": srl_forest,
}
