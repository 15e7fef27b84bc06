"""Dataflow operators: vocab, tagging, spans, linking, triples, dedup…"""
