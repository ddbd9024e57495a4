#!/usr/bin/env python3
"""Tiny test for refold_expect.py — the fold rules plus the round-17
census assert (orphaned expectations fail; --prune drops them).

Run: python3 tools/test_refold_expect.py
"""
import json
import os
import subprocess
import sys
import tempfile
import unittest

TOOL = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "refold_expect.py")


def run(args, cwd):
    return subprocess.run([sys.executable, TOOL] + args, cwd=cwd,
                          capture_output=True, text=True)


class RefoldExpectTest(unittest.TestCase):
    def setUp(self):
        self.dir = tempfile.mkdtemp(prefix="refold_test_")
        self.out = os.path.join(self.dir, "bench_expect.json")

    def write(self, name, obj):
        path = os.path.join(self.dir, name)
        with open(path, "w") as fh:
            json.dump(obj, fh)
        return path

    def read_out(self):
        with open(self.out) as fh:
            return json.load(fh)

    def test_fold_min_and_reset(self):
        self.write("bench_expect.json", {"q1": 0.5, "q2": 0.9})
        rec = self.write("rec.json",
                         {"queries": {"q1": 0.7, "q2": 0.4},
                          "stages": {}})
        r = run([rec, "--reset", "q1", "--out", self.out], self.dir)
        self.assertEqual(r.returncode, 0, r.stderr)
        # reset q1 takes this record's value even though it is worse;
        # q2 folds to the min of old and new
        self.assertEqual(self.read_out(), {"q1": 0.7, "q2": 0.4})

    def test_census_orphan_fails(self):
        self.write("bench_expect.json", {"q1": 0.5, "q_renamed": 0.2})
        rec = self.write("rec.json",
                         {"queries": {"q1": 0.4}, "stages": {}})
        r = run([rec, "--out", self.out], self.dir)
        self.assertNotEqual(r.returncode, 0)
        self.assertIn("q_renamed", r.stderr + r.stdout)
        # file untouched on failure
        self.assertEqual(self.read_out(), {"q1": 0.5, "q_renamed": 0.2})

    def test_census_prune_drops_orphan(self):
        self.write("bench_expect.json", {"q1": 0.5, "q_renamed": 0.2})
        rec = self.write("rec.json",
                         {"queries": {"q1": 0.4},
                          "stages": {"s1": 0.1}})
        r = run([rec, "--out", self.out, "--prune"], self.dir)
        self.assertEqual(r.returncode, 0, r.stderr)
        self.assertEqual(self.read_out(), {"q1": 0.4, "s1": 0.1})

    def test_reset_name_missing_from_records_fails(self):
        self.write("bench_expect.json", {"q1": 0.5})
        rec = self.write("rec.json",
                         {"queries": {"q1": 0.4}, "stages": {}})
        r = run([rec, "--reset", "q_gone", "--out", self.out], self.dir)
        self.assertNotEqual(r.returncode, 0)


if __name__ == "__main__":
    unittest.main()
