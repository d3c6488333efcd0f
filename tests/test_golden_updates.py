from golden_util import golden_suite

test_updates = golden_suite("updates.json")
