"""Golden-pair tests for the Porter2 stemmer (SURVEY.md §7: stemmer
byte-fidelity is load-bearing for rank identity)."""

from spaghettisearch_spark.functions.porter2 import stem

GOLDEN = {
    # snowballstem.org published sample pairs + algorithm examples
    "consign": "consign", "consigned": "consign", "consigning": "consign",
    "consignment": "consign", "consist": "consist", "consisted": "consist",
    "consistency": "consist", "consistent": "consist", "consistently": "consist",
    "consisting": "consist", "consists": "consist",
    "knack": "knack", "knackeries": "knackeri", "knacks": "knack",
    "generate": "generat", "generates": "generat", "generated": "generat",
    "generating": "generat", "general": "general", "generally": "general",
    "generic": "generic", "generically": "generic", "generous": "generous",
    "generously": "generous",
    "communism": "communism", "communist": "communist",
    "communities": "communiti", "community": "communiti",
    "arsenal": "arsenal", "arsenic": "arsenic",
    "ties": "tie", "cries": "cri", "gas": "gas", "this": "this",
    "gaps": "gap", "kiwis": "kiwi",
    "exceed": "exceed", "exceeding": "exceed",
    "luxuriated": "luxuri",  # 1b adds e -> luxuriate; step 4 deletes 'ate' (R2)
    "hopping": "hop", "hoped": "hope", "fizzed": "fizz",
    "failing": "fail", "filing": "file",
    "cry": "cri", "by": "by", "say": "say",
    "national": "nation", "rational": "ration",
    "agreed": "agre", "agreement": "agreement",
    "happy": "happi", "happily": "happili",
    "running": "run", "runner": "runner", "runs": "run",
    "beautiful": "beauti", "beautifully": "beauti",
    "absorption": "absorpt", "absorbed": "absorb",
    "dying": "die", "lying": "lie", "tying": "tie",
    "skies": "sky", "skis": "ski", "sky": "sky",
    "news": "news", "inning": "inning", "outing": "outing",
    "canning": "canning", "proceed": "proceed", "succeed": "succeed",
    "conditional": "condit", "conditionally": "condit",
    "activate": "activ", "activity": "activ", "active": "activ",
    "dog": "dog", "dogs": "dog",
    "argument": "argument", "arguments": "argument",
    "arguing": "argu", "argued": "argu",
    "yellow": "yellow", "young": "young",
    "hope": "hope", "hoping": "hope",
    "sizes": "size", "sized": "size", "sizing": "size",
    "falseness": "fals",
    "knit": "knit", "knitting": "knit", "knits": "knit",
    "early": "earli", "only": "onli", "singly": "singl",
    "ugly": "ugli", "gently": "gentl", "idly": "idl",
}


def test_golden_pairs():
    bad = {w: (want, stem(w)) for w, want in GOLDEN.items() if stem(w) != want}
    assert not bad, bad


def test_short_words_untouched():
    for w in ("a", "is", "be", "go"):
        assert stem(w) == w


def test_idempotent_on_stems():
    # stems of stems stay stable for common outputs
    for w in ("run", "consist", "gener", "tabl", "hash"):
        assert isinstance(stem(w), str)
