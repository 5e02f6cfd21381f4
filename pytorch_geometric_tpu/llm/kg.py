"""Text -> knowledge-graph extraction and LLM answer judging.

Clean-room equivalents of the reference's prompt-engineering stack
(``torch_geometric/llm/models/txt2kg.py`` and ``llm_judge.py``): the
string chunking / triple parsing / deterministic merging logic is pure
Python (tested offline); the actual LLM call is a pluggable callable so
local HF models, NIM endpoints, or test stubs slot in uniformly.
"""

import json
import re
import time
from typing import Callable, List, Optional, Tuple

TRIPLES_PROMPT = (
    "Please convert the above text into a list of knowledge triples "
    "with the form ('entity', 'relation', 'entity'). Separate each "
    "with a new line. Do not output anything else. Try to focus on "
    "key triples that form a connected graph.")

JUDGE_PROMPT = (
    'Instruction: You are a world class state of the art assistant '
    'for rating a User Answer given a Question. The Question is '
    'completely answered by the Reference Answer.\n'
    'Say 4, if User Answer is full contained and equivalent to '
    'Reference Answer in all terms, topics, numbers, metrics, dates '
    'and units.\n'
    'Say 2, if User Answer is partially contained and almost '
    'equivalent to Reference Answer in all terms, topics, numbers, '
    'metrics, dates and units.\n'
    'Say 0, if User Answer is not contained in Reference Answer or '
    'not accurate in all terms, topics, numbers, metrics, dates and '
    'units or the User Answer do not answer the question.\n'
    'Do not explain or justify your rating. Your rating must be only '
    '4, 2 or 0 according to the instructions above.\n'
    '### Question: "{question}"\n'
    '### User Answer: "{model_pred}"\n'
    '### Reference Answer: "{correct_answer}"\n'
    'The rating is:\n')


def chunk_text(text: str, chunk_size: int = 512) -> List[str]:
    """Split on sentence-ish boundaries into <= chunk_size pieces
    (reference ``txt2kg.py::_chunk_text``)."""
    if not text:
        return []
    sentences = re.split(r'(?<=[.!?])\s+', text)
    chunks, cur = [], ''
    for s in sentences:
        if cur and len(cur) + 1 + len(s) > chunk_size:
            chunks.append(cur)
            cur = s
        else:
            cur = (cur + ' ' + s).strip()
        while len(cur) > chunk_size:     # single overlong sentence
            chunks.append(cur[:chunk_size])
            cur = cur[chunk_size:]
    if cur:
        chunks.append(cur)
    return chunks


def parse_n_check_triples(triples_str: str
                          ) -> List[Tuple[str, str, str]]:
    """Robust parse of an LLM's triple list (reference
    ``txt2kg.py:250-290``): handles one-per-line, "(a,b,c) (d,e,f)"
    run-ons, stray quotes/parens, and drops malformed or
    empty-component rows."""
    out = []
    lines = triples_str.split('\n')
    if len(lines) > 1:
        candidates = lines
        obeyed = True
    else:
        candidates = triples_str.strip()[1:-1].split(') (')
        obeyed = False
    for cand in candidates:
        if obeyed:
            cand = cand.replace('(', '').replace(')', '').replace("'", '')
        parts = [p.strip().lower() for p in cand.split(',')]
        if len(parts) != 3:
            continue
        if any(not p for p in parts):
            continue
        if 'note:' in parts[0]:
            continue
        out.append(tuple(parts))
    return out


def merge_triples(per_chunk: List[List[Tuple[str, str, str]]]
                  ) -> List[Tuple[str, str, str]]:
    """Order-preserving dedup across chunk results (reference
    ``_merge_triples_deterministically``)."""
    seen = set()
    merged = []
    for chunk in per_chunk:
        for t in chunk:
            if t not in seen:
                seen.add(t)
                merged.append(t)
    return merged


class TXT2KG:
    """Convert documents into knowledge-graph triples with an LLM
    (reference ``txt2kg.py:19``).

    Args:
        triples_fn: callable ``text -> str`` producing the raw triple
            list for one chunk. Defaults to a lazily-constructed local
            LLM (gated on the ``transformers`` ecosystem); pass a NIM /
            API client wrapper for hosted models.
        chunk_size: characters per LLM call.
    """

    def __init__(self, triples_fn: Optional[Callable[[str], str]] = None,
                 model_name: str = 'VAGOsolutions/SauerkrautLM-v2-14b-DPO',
                 chunk_size: int = 512):
        self.triples_fn = triples_fn
        self.model_name = model_name
        self.chunk_size = chunk_size
        self.doc_id_counter = 0
        self.relevant_triples = {}
        self.total_chars_parsed = 0
        self.time_to_parse = 0.0

    def _default_fn(self, txt: str) -> str:
        from .models import LLM
        if not hasattr(self, '_llm'):
            self._llm = LLM(self.model_name)
        return self._llm.inference([txt + '\n' + TRIPLES_PROMPT],
                                   max_tokens=self.chunk_size)[0]

    def add_doc_2_KG(self, txt: str,
                     QA_pair: Optional[Tuple[str, str]] = None) -> None:
        key = QA_pair if QA_pair is not None else self.doc_id_counter
        t0 = time.time()
        fn = self.triples_fn or self._default_fn
        per_chunk = [parse_n_check_triples(fn(c))
                     for c in chunk_text(txt, self.chunk_size)]
        self.relevant_triples[key] = merge_triples(per_chunk)
        self.total_chars_parsed += len(txt)
        self.time_to_parse += time.time() - t0
        self.doc_id_counter += 1

    def save_kg(self, path: str) -> None:
        with open(path, 'w') as f:
            json.dump([{'key': list(k) if isinstance(k, tuple) else k,
                        'triples': [list(t) for t in v]}
                       for k, v in self.relevant_triples.items()], f)

    def load_kg(self, path: str) -> None:
        with open(path) as f:
            for rec in json.load(f):
                k = (tuple(rec['key']) if isinstance(rec['key'], list)
                     else rec['key'])
                self.relevant_triples[k] = [tuple(t)
                                            for t in rec['triples']]


class LLMJudge:
    """Score (question, prediction, reference) triples 0/0.5/1 with an
    LLM grader (reference ``llm_judge.py:54``)."""

    def __init__(self, call_fn: Optional[Callable[[str], str]] = None):
        self.call_fn = call_fn

    @staticmethod
    def _process_score(response: str) -> float:
        """First 4/2/0 token in the response -> score/4; NaN-safe
        (reference ``llm_judge.py:_process_score``)."""
        for tok in re.findall(r'\b[042]\b', response):
            return float(tok) / 4.0
        return 0.0

    def score(self, question: str, model_pred: str,
              correct_answer: str) -> float:
        prompt = JUDGE_PROMPT.format(question=question,
                                     model_pred=model_pred,
                                     correct_answer=correct_answer)
        if self.call_fn is None:
            raise RuntimeError(
                'LLMJudge needs a call_fn (an LLM endpoint wrapper); '
                'none was provided and no default endpoint exists in '
                'this offline build.')
        return self._process_score(self.call_fn(prompt))
