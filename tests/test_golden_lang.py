from golden_util import golden_suite

test_lang_core = golden_suite("lang_core.json")
