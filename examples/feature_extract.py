"""Embedding extraction from an AIGER file.

The reference's version imports a nonexistent ``deepgate.AigParser``
(examples/feature_extract.py:15, SURVEY.md §8 quirk 13); this framework
ships a real one (binary + ASCII AIGER, no aigtoaig subprocess).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

import deepgate

if __name__ == "__main__":
    model = deepgate.Model(modality="aig")
    aig_path = sys.argv[1] if len(sys.argv) > 1 else "./tmp/test.aig"
    parser = deepgate.AigParser()
    graph = parser.read_aiger(aig_path)
    hs, hf = model(graph)
    print(hs.shape, hf.shape)
