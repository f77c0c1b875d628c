/*
ako_tpu native runtime: sequential host-side pieces of the codec.

 1. The quantization / noise-gate exponential curve. It is defined over
    libm float32 ops (sqrtf/log2f/powf/roundf), so the only way to be
    bit-exact with the reference (library/quantization.c:43-97) is to
    evaluate it with the very same libm. Inputs are tiny and discrete;
    Python callers cache results per (tile, level, factor).

 2. The "Kagari" entropy coder: Elias-gamma codes (unary length prefix +
    binary value, MSB-first into a 64-bit accumulator) over a
    zigzag-mapped int16 stream with a run-length escape after two
    repeats. Behavioral contract from library/kagari.c:59-366, written
    fresh here: byte-exact output including the accumulator flush
    pattern, buffer-bound failure conditions, the RLE trigger/overflow
    rules, and the uint16 truncation quirk for zigzag(-32768)+1.

The wavelet/color/quantization compute path lives on the TPU; this file
is only the host bitstream tail (and its curve twin), plus a CPU golden
path used by tests.

Build: cc -O2 -fPIC -shared akort.c -lm -o _akort.so (see build.py).
*/

#include <math.h>
#include <stddef.h>
#include <stdint.h>

#define API __attribute__((visibility("default")))

/* ------------------------------------------------------------------ */
/* Quantization / gate curve                                           */

static float expo_curve(float factor, float tile_w, float tile_h, float cur_w,
                        float cur_h)
{
	const float root_area0 = sqrtf(tile_w * tile_h);
	const float root_area = sqrtf(cur_w * cur_h);
	const float lifts_total = log2f(root_area0) - 1.0f;
	const float lift_cur = log2f(root_area) - 1.0f;

	/* "highs first" tuning: degrade the high-frequency (large) levels
	   harder; exponent 6, scale 512*0.73 */
	const float linear = lift_cur / lifts_total;
	const float degrade = powf(linear + 1.0f, 6.0f) / powf(2.0f, 6.0f);

	const float base = powf(2.0f, lift_cur - 1.0f) * degrade;
	return roundf(base * (factor / (512.0f * 0.73f)));
}

API int32_t akort_quantization(int32_t factor, int32_t factor_mul, uint64_t tile_w,
                               uint64_t tile_h, uint64_t cur_w, uint64_t cur_h)
{
	if (factor <= 0)
		return 1;
	float q = expo_curve((float)factor * (float)factor_mul, (float)tile_w,
	                     (float)tile_h, (float)cur_w, (float)cur_h);
	if (q < 1.0f)
		q = 1.0f;
	if (q > 32765.0f)
		q = 32765.0f;
	return (int32_t)(int16_t)q;
}

API int32_t akort_gate(int32_t factor, int32_t factor_mul, uint64_t tile_w,
                       uint64_t tile_h, uint64_t cur_w, uint64_t cur_h)
{
	if (factor <= 0)
		return 0;
	float g = expo_curve((float)factor * (float)factor_mul, (float)tile_w,
	                     (float)tile_h, (float)cur_w, (float)cur_h);
	if (g < 0.0f)
		g = 0.0f;
	if (g > 32765.0f)
		g = 32765.0f;
	return (int32_t)(int16_t)g;
}

/* ------------------------------------------------------------------ */
/* Elias-gamma bit sink / source                                       */

#define ACC_BITS 64
#define REFILL_THRESHOLD 32
#define RLE_TRIGGER 2
#define VALUE_MAX 65535

typedef struct {
	uint64_t acc;
	int used; /* bits currently held */
	uint8_t *pos;
	const uint8_t *lim;
} BitSink;

typedef struct {
	uint64_t acc;
	int used;
	const uint8_t *pos;
	const uint8_t *lim;
} BitSource;

static int gamma_bits(uint16_t v)
{
	int b = 0;
	while (v > 1) {
		v >>= 1;
		b++;
	}
	return b * 2 + 1;
}

/* Append one gamma code; returns bits written, 0 on out-of-space.
   The flush pattern (drain one byte at a time only while the new code
   would not fit, and only once more than 8 bits are buffered) is part
   of the byte-exact contract. */
static int sink_put(BitSink *s, uint16_t v)
{
	const int nbits = gamma_bits(v);

	if (s->used > 8 && s->used + nbits > ACC_BITS) {
		if (s->pos + (s->used / 8) >= s->lim)
			return 0;
		do {
			s->used -= 8;
			*s->pos++ = (uint8_t)(s->acc >> s->used);
		} while (s->used + nbits > ACC_BITS);
	}

	s->used += nbits;
	s->acc = (s->acc << nbits) | (uint64_t)v;
	return nbits;
}

/* Drain whole bytes then the zero-padded partial byte; returns total
   stream size in bytes from `start`, 0 on out-of-space. */
static size_t sink_finish(BitSink *s, const uint8_t *start)
{
	while (s->used / 8 != 0) {
		if (s->pos + 1 >= s->lim)
			return 0;
		s->used -= 8;
		*s->pos++ = (uint8_t)(s->acc >> s->used);
	}
	if (s->used != 0) {
		if (s->pos + 1 >= s->lim)
			return 0;
		*s->pos++ = (uint8_t)(s->acc << (8 - s->used));
	}
	return (size_t)(s->pos - start);
}

/* Read one gamma code; 0 return with *bits_out==0 means failure. */
static uint16_t source_get(BitSource *s, int *bits_out)
{
	if (s->acc == 0 || s->used < (ACC_BITS - REFILL_THRESHOLD)) {
		/* plain while loops: entering with used > 56 (possible only on
		   corrupt input, via acc == 0) must not shift by a negative
		   count — reading nothing falls through to the acc == 0 check */
		if (s->pos + ((ACC_BITS - s->used) / 8) < s->lim) {
			while (s->used < (ACC_BITS - 8)) {
				s->used += 8;
				s->acc |= (uint64_t)(*s->pos++) << (ACC_BITS - s->used);
			}
		} else {
			while (s->used < (ACC_BITS - 8) && s->pos < s->lim) {
				s->used += 8;
				s->acc |= (uint64_t)(*s->pos++) << (ACC_BITS - s->used);
			}
		}
		if (s->acc == 0)
			return 0;
	}

	const uint32_t top = (uint32_t)(s->acc >> REFILL_THRESHOLD);
	const int unary = (top == 0) ? 32 : __builtin_clz(top);
	const int nbits = unary * 2 + 1;

	if (nbits > s->used)
		return 0;

	*bits_out = nbits;
	const uint16_t v = (uint16_t)(s->acc >> (ACC_BITS - nbits));
	s->acc <<= nbits;
	s->used -= nbits;
	return v;
}

/* ------------------------------------------------------------------ */
/* Kagari stream layer: zigzag literals + RLE escapes                  */

static uint16_t zigzag16(int16_t v)
{
	return (uint16_t)(((int32_t)v << 1) ^ ((int32_t)v >> 15));
}

static int16_t unzigzag16(uint16_t u)
{
	return (int16_t)((u >> 1) ^ (uint16_t)(0u - (u & 1u)));
}

API size_t akort_kagari_encode(const void *input, size_t input_size, void *output,
                               size_t output_size)
{
	const int16_t *in = (const int16_t *)input;
	const int16_t *const in_lim = (const int16_t *)((const uint8_t *)input + input_size);

	BitSink sink = {0, 0, (uint8_t *)output, (const uint8_t *)output + output_size};

	if (output_size == 0 || input_size == 0 || (input_size % 2) != 0)
		return 0;

	/* literal = gamma(zigzag(v) + 1); the +1 wraps to 0 for v == -32768,
	   matching the reference's uint16 argument truncation */
	if (sink_put(&sink, (uint16_t)(zigzag16(*in) + 1)) == 0)
		return 0;

	int16_t prev = *in++;
	uint32_t run = 0;

	for (; in < in_lim; in++) {
		if (*in == prev) {
			run++;
			if (run <= RLE_TRIGGER) {
				if (sink_put(&sink, (uint16_t)(zigzag16(*in) + 1)) == 0)
					return 0;
			} else if (run == VALUE_MAX - 1) {
				/* emit before the run counter overflows the code range */
				if (sink_put(&sink, (uint16_t)(run - RLE_TRIGGER + 1)) == 0)
					return 0;
				run = 0;
			}
		} else {
			if (run >= RLE_TRIGGER) {
				if (sink_put(&sink, (uint16_t)(run - RLE_TRIGGER + 1)) == 0)
					return 0;
			}
			if (sink_put(&sink, (uint16_t)(zigzag16(*in) + 1)) == 0)
				return 0;
			prev = *in;
			run = 0;
		}
	}

	if (run >= RLE_TRIGGER) {
		if (sink_put(&sink, (uint16_t)(run - RLE_TRIGGER + 1)) == 0)
			return 0;
	}

	return sink_finish(&sink, (const uint8_t *)output);
}

API size_t akort_kagari_decode(size_t count, const void *input, size_t input_size,
                               void *output, size_t output_size)
{
	BitSource src = {0, 0, (const uint8_t *)input,
	                 (const uint8_t *)input + input_size};

	int16_t *out = (int16_t *)output;
	const int16_t *const out_lim = (const int16_t *)((uint8_t *)output + output_size);

	if (output_size == 0 || input_size == 0 || count == 0 || (output_size % 2) != 0)
		return 0;

	int bits = 0;
	uint16_t u = source_get(&src, &bits);
	if (bits == 0)
		return 0;

	int16_t prev = unzigzag16((uint16_t)(u - 1));
	*out++ = prev;
	count--;

	uint32_t run = 0;
	for (; count != 0; count--) {
		if (out == out_lim)
			return 0;

		bits = 0;
		u = source_get(&src, &bits);
		if (bits == 0)
			return 0;
		const int16_t v = unzigzag16((uint16_t)(u - 1));

		if (v == prev) {
			*out++ = v;
			run++;
			if (run == RLE_TRIGGER) {
				bits = 0;
				const uint16_t rle_raw = source_get(&src, &bits);
				if (bits == 0)
					return 0;
				const uint16_t rle_len = (uint16_t)(rle_raw - 1);

				if ((out + (size_t)rle_len) > out_lim)
					return 0;
				for (uint16_t i = 0; i < rle_len; i++)
					out[i] = prev;
				out += rle_len;
				run = 0;
				count -= rle_len; /* may wrap; caught by out_lim check */
			}
		} else {
			*out++ = v;
			prev = v;
			run = 0;
		}
	}

	return (size_t)(src.pos - (const uint8_t *)input);
}

/* ------------------------------------------------------------------ */
/* Sync scan for the device-side parallel decoder                      */

/* consec sentinel: "first output of the stream pending" (the reference
   writes the first literal without any run-comparison, kagari.c:322) */
#define SYNC_FIRST 0xFFFFu

/*
Walk the Kagari stream exactly like akort_kagari_decode, but instead of
writing values, record the decoder state at every `block`-th output
position: (logical bit offset of the next unread code, previous value,
consecutive-equal count, remaining run length). A TPU program then
decodes all blocks in parallel from these sync points, bit-exactly
(ops/kagari_device.py:kagari_decode_device).

The logical bit offset is the sum of consumed code lengths; it is
independent of the byte-granular accumulator readahead. Failure
conditions mirror akort_kagari_decode one-for-one (same BitSource, same
output-capacity checks), so the device path errors exactly when the
host path would (reference kagari.c:301-366).

Returns consumed input bytes (cursor position including readahead, the
same value akort_kagari_decode returns) or 0 on broken input. Writes
ceil(count/block) records.
*/
API size_t akort_kagari_sync(size_t count, const void *input, size_t input_size,
                             size_t output_size, size_t block,
                             uint32_t *bit_off, int16_t *prev_arr,
                             uint16_t *consec_arr, uint16_t *run_arr,
                             uint32_t *max_code_bits)
{
	BitSource src = {0, 0, (const uint8_t *)input,
	                 (const uint8_t *)input + input_size};

	if (output_size == 0 || input_size == 0 || count == 0 || block == 0 ||
	    (output_size % 2) != 0)
		return 0;

	const size_t out_cap = output_size / 2;
	const size_t n_rec = (count + block - 1) / block;
	size_t no = count;
	size_t out_idx = 0;
	size_t rec = 0;
	uint32_t bitpos = 0;
	uint32_t maxbits = 0;
	int16_t prev = 0;
	uint32_t run = 0;
	int bits = 0;
	uint16_t u;
	int16_t v;

#define SYNC_BITS()                                                       \
	do {                                                                  \
		if ((uint32_t)bits > maxbits)                                     \
			maxbits = (uint32_t)bits;                                     \
	} while (0)

#define SYNC_EMIT(consec_v, runrem_v)                                     \
	do {                                                                  \
		if (rec < n_rec && out_idx % block == 0) {                        \
			bit_off[rec] = bitpos;                                        \
			prev_arr[rec] = prev;                                         \
			consec_arr[rec] = (uint16_t)(consec_v);                       \
			run_arr[rec] = (uint16_t)(runrem_v);                          \
			rec++;                                                        \
		}                                                                 \
	} while (0)

	/* first value: written without run comparison (kagari.c:322) */
	SYNC_EMIT(SYNC_FIRST, 0);
	u = source_get(&src, &bits);
	if (bits == 0)
		return 0;
	SYNC_BITS();
	bitpos += (uint32_t)bits;
	prev = unzigzag16((uint16_t)(u - 1));
	out_idx++;
	no--;

	for (; no != 0; no--) {
		if (out_idx >= out_cap)
			return 0;
		SYNC_EMIT(run, 0);

		bits = 0;
		u = source_get(&src, &bits);
		if (bits == 0)
			return 0;
		SYNC_BITS();
		bitpos += (uint32_t)bits;
		v = unzigzag16((uint16_t)(u - 1));

		if (v == prev) {
			out_idx++;
			run++;
			if (run == RLE_TRIGGER) {
				bits = 0;
				const uint16_t rle_raw = source_get(&src, &bits);
				if (bits == 0)
					return 0;
				SYNC_BITS();
				bitpos += (uint32_t)bits;
				const uint16_t rle_len = (uint16_t)(rle_raw - 1);
				if (out_idx + (size_t)rle_len > out_cap)
					return 0;
				for (size_t i = 0; i < (size_t)rle_len; i++) {
					if (rec < n_rec && out_idx % block == 0) {
						bit_off[rec] = bitpos;
						prev_arr[rec] = prev;
						consec_arr[rec] = 0;
						run_arr[rec] = (uint16_t)(rle_len - i);
						rec++;
					}
					out_idx++;
				}
				run = 0;
				no -= rle_len; /* may wrap; caught by out_cap check */
			}
		} else {
			out_idx++;
			prev = v;
			run = 0;
		}
	}

#undef SYNC_EMIT
#undef SYNC_BITS
	*max_code_bits = maxbits;
	return (size_t)(src.pos - (const uint8_t *)input);
}
