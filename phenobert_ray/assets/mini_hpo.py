"""Deterministic synthetic mini-HPO ontology (FIXTURES.md §5).

Stand-in for the reference's ``data/hpo.json`` (not shipped there; node
schema at /root/reference/phenobert/utils/util.py:27-44).  ~50 nodes, root
HP:0000118, four L1 subtrees, one multi-parent node (DAG, not tree),
alt_ids, multi-word synonyms, one deep LCS pair, and one branch OUTSIDE the
phenotypic-abnormality subtree whose phrases must be rejected by the
subtree filter (util.py:1049).

``ORACLE_PHRASES`` is the deterministic injection list used by the DuckDB
correctness oracle: every phrase is lowercase ASCII ``[a-z ]`` with tokens
disjoint from the synthetic ``documents`` base vocabulary, contains no
stopwords/digits, and no two phrases are bag-anagrams of each other.
"""

from __future__ import annotations

from .hpo_dag import HpoDag

ROOT = "HP:0000118"


def mini_nodes() -> dict[str, dict]:
    def n(name, is_a, syn=(), alt=()):
        return {"name": [name], "synonym": list(syn), "is_a": list(is_a),
                "alt_id": list(alt)}

    nodes: dict[str, dict] = {
        "HP:0000001": n("All", []),
        ROOT: n("Phenotypic abnormality", ["HP:0000001"]),
        # outside-subtree branch: dictionary hits here must be REJECTED
        "HP:0000005": n("Mode of inheritance", ["HP:0000001"]),
        "HP:0000006": n("Autosomal dominant inheritance", ["HP:0000005"],
                        syn=["dominant inheritance"]),
        # ---- L1 subtrees -------------------------------------------------
        "HP:0000707": n("Abnormality of the nervous system", [ROOT]),
        "HP:0000152": n("Abnormality of head or neck", [ROOT]),
        "HP:0000924": n("Abnormality of the skeletal system", [ROOT]),
        "HP:0001939": n("Abnormality of metabolism", [ROOT]),
        # ---- nervous system ---------------------------------------------
        "HP:0012638": n("Abnormal nervous system physiology", ["HP:0000707"]),
        "HP:0001250": n("Seizure", ["HP:0012638"], syn=["seizures", "epileptic seizure"],
                        alt=["HP:0010520"]),
        "HP:0002373": n("Febrile seizure", ["HP:0001250"], syn=["febrile seizures"]),
        "HP:0002069": n("Bilateral tonic clonic seizure", ["HP:0001250"],
                        syn=["grand mal seizure"]),
        "HP:0001252": n("Hypotonia", ["HP:0012638"], syn=["muscular hypotonia",
                                                          "low muscle tone"]),
        "HP:0001263": n("Global developmental delay", ["HP:0012638"],
                        syn=["developmental delay"]),
        # multi-parent node (nervous system + head/neck): DAG not tree
        "HP:0000648": n("Optic atrophy", ["HP:0012638", "HP:0000478"],
                        syn=["optic nerve atrophy"]),
        "HP:0000478": n("Abnormality of the eye", [ROOT]),
        "HP:0000505": n("Visual impairment", ["HP:0000478"], syn=["impaired vision"]),
        "HP:0000618": n("Blindness", ["HP:0000505"]),
        # deep LCS pair: nystagmus / strabismus share HP:0000478 ancestry deep
        "HP:0000639": n("Nystagmus", ["HP:0000478"]),
        "HP:0000486": n("Strabismus", ["HP:0000478"], syn=["squint"]),
        # ---- head / neck -------------------------------------------------
        "HP:0000234": n("Abnormality of the head", ["HP:0000152"]),
        "HP:0000252": n("Microcephaly", ["HP:0000234"], syn=["small cranium"]),
        "HP:0000256": n("Macrocephaly", ["HP:0000234"], syn=["large cranium"],
                        alt=["HP:0001355"]),
        "HP:0000316": n("Hypertelorism", ["HP:0000234"],
                        syn=["widely spaced eyes"]),
        "HP:0000365": n("Hearing impairment", ["HP:0000152"],
                        syn=["deafness", "hearing loss"]),
        # ---- skeletal ----------------------------------------------------
        "HP:0002817": n("Abnormality of the upper limb", ["HP:0000924"]),
        "HP:0001155": n("Abnormality of the hand", ["HP:0002817"]),
        "HP:0011304": n("Broad thumb", ["HP:0001155"], syn=["broad thumbs"]),
        "HP:0001156": n("Brachydactyly", ["HP:0001155"],
                        syn=["short digits", "short fingers"]),
        "HP:0010055": n("Broad toe", ["HP:0000924"], syn=["broad toes"]),
        "HP:0001166": n("Arachnodactyly", ["HP:0001155"], syn=["long slender fingers"]),
        "HP:0002650": n("Scoliosis", ["HP:0000924"], alt=["HP:0002944"]),
        "HP:0000926": n("Platyspondyly", ["HP:0000924"], syn=["flattened vertebrae"]),
        # ---- metabolism --------------------------------------------------
        "HP:0001943": n("Hypoglycemia", ["HP:0001939"], syn=["low blood glucose"]),
        "HP:0003119": n("Abnormal circulating lipid concentration", ["HP:0001939"],
                        syn=["lipid abnormality"]),
        "HP:0004322": n("Short stature", ["HP:0000924", "HP:0001939"],
                        syn=["decreased body height", "stature below centile"]),
        "HP:0001513": n("Obesity", ["HP:0001939"], syn=["adiposity"]),
        "HP:0000819": n("Diabetes mellitus", ["HP:0001939"]),
        "HP:0002615": n("Hypotension", ["HP:0001939"], syn=["decreased systemic blood pressure"]),
        "HP:0000822": n("Hypertension", ["HP:0001939"], syn=["elevated blood pressure"],
                        alt=["HP:0000861"]),
        # number-word synonym: exercises NUM substitution (data/NUM.txt)
        "HP:0004691": n("Toe syndactyly of third and fourth toes", ["HP:0000924"],
                        syn=["cutaneous syndactyly of toes three and four"]),
        "HP:0001999": n("Abnormal facial shape", ["HP:0000234"],
                        syn=["facial dysmorphism", "dysmorphic face"]),
        "HP:0001627": n("Abnormal heart morphology", [ROOT],
                        syn=["cardiac anomaly", "cardiac anomalies"]),
        "HP:0001631": n("Atrial septal defect", ["HP:0001627"]),
        "HP:0001629": n("Ventricular septal defect", ["HP:0001627"]),
        "HP:0000083": n("Renal insufficiency", [ROOT], syn=["kidney failure"]),
    }
    return nodes


def mini_dag() -> HpoDag:
    return HpoDag(mini_nodes())


# ---------------------------------------------------------------------------
# Injection list for the DuckDB oracle.  (phrase, hpo_id) — phrase must be a
# name/synonym above, lowercase ascii, stopword/digit free, ≤10 tokens.
ORACLE_PHRASES: list[tuple[str, str]] = [
    ("seizure", "HP:0001250"),
    ("febrile seizure", "HP:0002373"),
    ("grand mal seizure", "HP:0002069"),
    ("muscular hypotonia", "HP:0001252"),
    ("developmental delay", "HP:0001263"),
    ("optic atrophy", "HP:0000648"),
    ("visual impairment", "HP:0000505"),
    ("blindness", "HP:0000618"),
    ("nystagmus", "HP:0000639"),
    ("strabismus", "HP:0000486"),
    ("microcephaly", "HP:0000252"),
    ("macrocephaly", "HP:0000256"),
    ("hypertelorism", "HP:0000316"),
    ("hearing loss", "HP:0000365"),
    ("broad thumb", "HP:0011304"),
    ("brachydactyly", "HP:0001156"),
    ("broad toes", "HP:0010055"),
    ("arachnodactyly", "HP:0001166"),
    ("scoliosis", "HP:0002650"),
    ("platyspondyly", "HP:0000926"),
    ("hypoglycemia", "HP:0001943"),
    ("short stature", "HP:0004322"),
    ("obesity", "HP:0001513"),
    ("diabetes mellitus", "HP:0000819"),
    ("hypertension", "HP:0000822"),
    ("hearing impairment", "HP:0000365"),
    ("kidney failure", "HP:0000083"),
    ("atrial septal defect", "HP:0001631"),
    ("ventricular septal defect", "HP:0001629"),
    ("facial dysmorphism", "HP:0001999"),
]

N_ORACLE_PHRASES = len(ORACLE_PHRASES)
