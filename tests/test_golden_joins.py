from golden_util import golden_suite

test_joins = golden_suite("joins.json")
