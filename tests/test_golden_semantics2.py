from golden_util import golden_suite

test_semantics2 = golden_suite("semantics2.json")
