"""Round-trip example mirroring the reference's acceptance test
(reference examples/sample_impl.rs:72-128): build an order-0 frequency table
over a 16-symbol / 10-alphabet input, encode, decode, and assert equality.

Run:  python examples/sample_impl.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from range_coder_rust_tpu import Decoder, Encoder, FreqTable

TEST_DATA = [2, 1, 1, 4, 1, 4, 2, 1, 0, 1, 5, 9, 8, 7, 6, 5]


def main() -> None:
    sd = FreqTable(10)
    for i in TEST_DATA:
        sd.add_alphabet_freq(i)
    sd.calc_cum()

    print("FREQ TABLE")
    for i in range(sd.alphabet_count):
        print(f"index:{i}, c:{sd.c_freq(i)}, cum:{sd.cum_freq(i)}")
    print()

    print("ENCODING")
    encoder = Encoder()
    print("encode : " + ",".join(str(i) for i in TEST_DATA) + ",")
    for i in TEST_DATA:
        encoder.encode(sd, i)
    code = encoder.finish()
    print("output : 0x" + "".join(f"{b:x}" for b in code))
    print(f"length : {len(code)}byte")
    print()

    decoder = Decoder(code)
    print("DECODING")
    decodeds = [decoder.decode(sd) for _ in TEST_DATA]
    print("decode : " + ",".join(str(i) for i in decodeds) + ",")

    assert decodeds == TEST_DATA
    print()
    print("test passed🎉")


if __name__ == "__main__":
    main()
