from golden_util import golden_suite

test_math_sem = golden_suite("math_sem.json")
