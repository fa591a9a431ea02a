# Convenience targets for nasa_niswan_tpu development.

.PHONY: test test-fast bench train-canonical eval lint headlines headlines-check

# Re-render the headline tables in README/RESULTS/PERFORMANCE from
# docs/headlines.json (the single source of truth for headline numbers).
headlines:
	python scripts/gen_headlines.py --write

headlines-check:
	python scripts/gen_headlines.py --check

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x --ignore=tests/test_train.py \
	    --ignore=tests/test_eval_cli.py --ignore=tests/test_utils.py \
	    --ignore=tests/test_gan.py

bench:
	python bench.py

train-canonical:
	scripts/launch_canonical.sh

eval:
	@test -n "$(RUN_DIR)" || (echo "usage: make eval RUN_DIR=<snapshot>" && exit 1)
	python -m nasa_niswan_tpu.evalx --run-dir $(RUN_DIR)
