/* Sanitizer fuzz driver for akort.c's untrusted-input parsers.
 *
 * The host-decode path (AKO_TPU_DECODE=host) and the device decoder's
 * sync scan feed *attacker-controlled blob bytes* into
 * akort_kagari_decode / akort_kagari_sync / akort_manba_decode /
 * akort_manba_sync, and the unlift consumes the resulting stream.
 * This driver links akort.c under ASan+UBSan and hammers those entry
 * points with the same corpus classes as the Python fuzz campaigns
 * (tests/campaigns/fuzz_campaign.py): valid encoder output, random
 * truncations, random bit flips, and pure-garbage buffers — across
 * adversarial count/capacity combinations. Any out-of-bounds read,
 * overflow, or UB aborts the run (-fno-sanitize-recover).
 *
 * Build + run: python devbench/asan_fuzz.py  (writes ASAN_r04.json)
 * Reference anchor: the over-read class the reference itself had
 * (PARITY.md divergence 4; /root/reference/library/compression.c:58).
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

/* akort.c API (linked statically into this binary) */
size_t akort_kagari_encode(const void *input, size_t input_size, void *output,
                           size_t output_size);
size_t akort_kagari_decode(size_t count, const void *input, size_t input_size,
                           void *output, size_t output_size);
size_t akort_kagari_sync(size_t count, const void *input, size_t input_size,
                         size_t output_size, size_t block, uint32_t *bit_off,
                         int16_t *prev_arr, uint16_t *consec_arr,
                         uint16_t *run_arr, uint32_t *max_code_bits);
size_t akort_manba_encode(const void *input, size_t input_size, void *output,
                          size_t output_capacity);
size_t akort_manba_decode(size_t count, const void *input, size_t input_size,
                          void *output, size_t output_size);
size_t akort_manba_sync(size_t count, const void *input, size_t input_size,
                        size_t block, uint32_t *x_arr, uint32_t *rbyte_arr,
                        uint32_t *ebit_arr, uint16_t *freq_out,
                        uint32_t *rans_off, uint32_t *rans_end,
                        uint32_t *extras_off);
int32_t akort_tile_unlift(const int16_t *stream, size_t stream_elems,
                          int32_t tile_w, int32_t tile_h, int32_t channels,
                          int32_t wavelet, int32_t wrap, int16_t *planes_out);
int32_t akort_tile_decode_block(const uint8_t *payload, size_t payload_size,
                                size_t count, size_t output_capacity_bytes,
                                int32_t tile_w, int32_t tile_h,
                                int32_t channels, int32_t wavelet,
                                int32_t wrap, int32_t color,
                                uint8_t *pixels_out);
int32_t akort_tile_encode_spans(const uint8_t *image, int64_t row_stride,
                                int32_t channels, int32_t wavelet,
                                int32_t wrap, int32_t color,
                                int32_t discard_nv, int32_t n,
                                const int32_t *rects, const int64_t *qg_off,
                                const int32_t *qs, const int32_t *gs,
                                const int64_t *counts, const int64_t *caps,
                                uint8_t *out, const int64_t *out_off,
                                int64_t *sizes);
int32_t akort_tile_decode_spans(const uint8_t *blob, const int64_t *pay_off,
                                const int64_t *pay_size,
                                const int64_t *counts, const int64_t *caps,
                                int32_t n, const int32_t *rects,
                                int64_t row_stride, int32_t channels,
                                int32_t wavelet, int32_t wrap, int32_t color,
                                uint8_t *image_out);

static uint64_t rng_state = 0x9E3779B97F4A7C15ull;

static uint64_t rng_next(void)
{
	uint64_t x = rng_state;
	x ^= x << 13;
	x ^= x >> 7;
	x ^= x << 17;
	rng_state = x;
	return x;
}

static size_t rng_below(size_t n)
{
	return n ? (size_t)(rng_next() % n) : 0;
}

/* Exercise every parser on one payload. Output buffers are allocated
 * EXACTLY at the declared capacity so any overrun trips ASan's
 * redzones; count/capacity pairs include lying ones (count far beyond
 * what the payload holds, capacity smaller than count demands). */
static void hit_parsers(const uint8_t *payload, size_t len)
{
	static const size_t counts[] = {1, 7, 64, 1000, 70000};
	for (size_t ci = 0; ci < sizeof(counts) / sizeof(counts[0]); ci++) {
		const size_t count = counts[ci];
		const size_t caps[] = {2, count, count * 2, count * 2 + 64};
		for (size_t ki = 0; ki < 4; ki++) {
			const size_t cap = caps[ki] & ~(size_t)1; /* even */
			if (cap == 0)
				continue;
			uint8_t *out = (uint8_t *)malloc(cap);
			akort_kagari_decode(count, payload, len, out, cap);
			akort_manba_decode(count, payload, len, out, cap);
			free(out);

			const size_t block = 1 + rng_below(64);
			const size_t n_rec = (count + block - 1) / block;
			uint32_t *bit_off = (uint32_t *)malloc(n_rec * 4);
			int16_t *prev = (int16_t *)malloc(n_rec * 2);
			uint16_t *consec = (uint16_t *)malloc(n_rec * 2);
			uint16_t *run = (uint16_t *)malloc(n_rec * 2);
			uint32_t maxbits = 0;
			akort_kagari_sync(count, payload, len, cap, block, bit_off,
			                  prev, consec, run, &maxbits);
			uint32_t *x = (uint32_t *)malloc(n_rec * 4);
			uint32_t *rb = (uint32_t *)malloc(n_rec * 4);
			uint32_t *eb = (uint32_t *)malloc(n_rec * 4);
			uint16_t freq[17];
			uint32_t ro, re, eo;
			akort_manba_sync(count, payload, len, block, x, rb, eb, freq,
			                 &ro, &re, &eo);
			free(bit_off);
			free(prev);
			free(consec);
			free(run);
			free(x);
			free(rb);
			free(eb);
		}
	}
}

/* The unlift's stream length is geometry-validated, but drive it with
 * hostile geometry anyway (wrong sizes must be rejected, never read).
 * The single-call block decoder (the host-decode pipeline's entry for
 * untrusted payload bytes) gets the same treatment: hostile payloads
 * against every geometry/wavelet/wrap/color combination. */
static void hit_unlift(const int16_t *stream, size_t elems)
{
	static const int32_t dims[][2] = {{8, 8}, {16, 16}, {3, 5}, {33, 47}};
	for (size_t d = 0; d < sizeof(dims) / sizeof(dims[0]); d++) {
		const int32_t tw = dims[d][0], th = dims[d][1];
		for (int32_t ch = 1; ch <= 4; ch += 3) {
			int16_t *planes =
			    (int16_t *)malloc((size_t)tw * th * ch * 2);
			uint8_t *pix = (uint8_t *)malloc((size_t)tw * th * ch);
			for (int32_t wav = 0; wav < 4; wav++) {
				akort_tile_unlift(stream, elems, tw, th, ch, wav,
				                  (int32_t)rng_below(4), planes);
				/* count/capacity both honest and lying */
				const size_t counts[2] = {elems, (size_t)tw * th * ch};
				for (int ci = 0; ci < 2; ci++)
					akort_tile_decode_block(
					    (const uint8_t *)stream, elems * 2, counts[ci],
					    2 * counts[ci] + 2 * (size_t)(tw + th) * 2,
					    tw, th, ch, wav, (int32_t)rng_below(4),
					    (int32_t)rng_below(4), pix);
			}
			free(planes);
			free(pix);
		}
	}
}

int main(int argc, char **argv)
{
	const long iters = argc > 1 ? strtol(argv[1], NULL, 10) : 200;
	long cases = 0;

	for (long it = 0; it < iters; it++) {
		/* 1. a valid stream from each encoder */
		const size_t n = 16 + rng_below(4096);
		int16_t *vals = (int16_t *)malloc(n * 2);
		for (size_t i = 0; i < n; i++) {
			const uint64_t r = rng_next();
			/* mix smooth runs (RLE paths) with full-range values */
			vals[i] = (r & 3) ? (int16_t)(r % 37) : (int16_t)r;
		}
		const size_t cap = n * 2 + 64;
		uint8_t *buf = (uint8_t *)malloc(cap);
		const size_t klen =
		    akort_kagari_encode(vals, n * 2, buf, cap);
		uint8_t *mbuf = (uint8_t *)malloc(cap * 2);
		const size_t mlen =
		    akort_manba_encode(vals, n * 2, mbuf, cap * 2);

		const uint8_t *srcs[2] = {buf, mbuf};
		const size_t lens[2] = {klen, mlen};
		for (int s = 0; s < 2; s++) {
			if (lens[s] == 0)
				continue;
			/* exact-size copy: redzones directly after payload */
			uint8_t *p = (uint8_t *)malloc(lens[s]);
			memcpy(p, srcs[s], lens[s]);
			hit_parsers(p, lens[s]);
			cases++;
			/* 2. truncations */
			for (int t = 0; t < 4; t++) {
				const size_t cut = 1 + rng_below(lens[s]);
				uint8_t *q = (uint8_t *)malloc(cut);
				memcpy(q, p, cut);
				hit_parsers(q, cut);
				free(q);
				cases++;
			}
			/* 3. bit flips */
			for (int f = 0; f < 6; f++) {
				p[rng_below(lens[s])] ^= (uint8_t)(1u << rng_below(8));
				hit_parsers(p, lens[s]);
				cases++;
			}
			free(p);
		}
		/* 4. pure garbage */
		const size_t glen = 1 + rng_below(2048);
		uint8_t *g = (uint8_t *)malloc(glen);
		for (size_t i = 0; i < glen; i++)
			g[i] = (uint8_t)rng_next();
		hit_parsers(g, glen);
		/* 5. hostile unlift streams (random contents + sizes) */
		hit_unlift((const int16_t *)g, glen / 2);
		free(g);
		cases += 2;

		/* 6. the batched span entries against redzone-exact buffers:
		 * a 2-tile encode from a tiny image, then decode spans fed
		 * the resulting (and then corrupted) payloads. Offsets are
		 * producer-trusted in the pipeline, but the scratch sizing
		 * and rect walk deserve direct sanitizer coverage. */
		{
			const int32_t tw = 8, th = 8, ch = 2;
			const int32_t iw = 16, ih = 8;
			uint8_t *img = (uint8_t *)malloc((size_t)iw * ih * ch);
			for (int32_t i = 0; i < iw * ih * ch; i++)
				img[i] = (uint8_t)rng_next();
			const int32_t rects[8] = {0, 0, tw, th, 8, 0, tw, th};
			const int64_t qg_off[2] = {0, 0};
			/* geometry.tile_data_size(8, 8) = 132 bytes/channel;
			   2 levels x 2 channels of q=1/g=0 lift steps */
			const int32_t qs_arr[4] = {1, 1, 1, 1};
			const int32_t gs_arr[4] = {0, 0, 0, 0};
			const size_t tds = 132 * (size_t)ch;
			const int64_t counts[2] = {(int64_t)tds / 2,
			                           (int64_t)tds / 2};
			const int64_t caps[2] = {(int64_t)tds - 4,
			                         (int64_t)tds - 4};
			const int64_t out_off[2] = {0, (int64_t)tds};
			uint8_t *sout = (uint8_t *)malloc(2 * tds);
			int64_t sizes[2] = {0, 0};
			akort_tile_encode_spans(img, (int64_t)iw * ch, ch, 0, 0,
			                        0, 0, 2, rects, qg_off, qs_arr,
			                        gs_arr, counts, caps, sout,
			                        out_off, sizes);
			if (sizes[0] > 0 && sizes[1] > 0) {
				const int64_t pay_off[2] = {4, out_off[1] + 4};
				int64_t pay_sz[2] = {sizes[0], sizes[1]};
				const int64_t dcaps[2] = {
				    (int64_t)(tds + (size_t)(tw + th) * 2),
				    (int64_t)(tds + (size_t)(tw + th) * 2)};
				uint8_t *dimg =
				    (uint8_t *)malloc((size_t)iw * ih * ch);
				akort_tile_decode_spans(sout, pay_off, pay_sz,
				                        counts, dcaps, 2, rects,
				                        (int64_t)iw * ch, ch, 0,
				                        0, 0, dimg);
				/* corrupt a payload byte and a size, re-drive */
				sout[4 + rng_below((size_t)sizes[0])] ^= 0xFF;
				pay_sz[1] = (int64_t)(1 + rng_below((size_t)sizes[1]));
				akort_tile_decode_spans(sout, pay_off, pay_sz,
				                        counts, dcaps, 2, rects,
				                        (int64_t)iw * ch, ch, 0,
				                        0, 0, dimg);
				free(dimg);
				cases += 2;
			}
			free(sout);
			free(img);
			cases++;
		}

		free(vals);
		free(buf);
		free(mbuf);
	}
	printf("{\"iters\": %ld, \"cases\": %ld, \"clean\": true}\n", iters,
	       cases);
	return 0;
}
