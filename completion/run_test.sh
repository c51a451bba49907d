#!/usr/bin/env bash
set -e
cd "$(dirname "$0")"
exec python test.py --config "cfgs/$1.yaml"
