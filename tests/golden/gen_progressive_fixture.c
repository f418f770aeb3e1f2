/* Generates the INDEPENDENT progressive-JPEG fixtures (round-10
 * advice #2): the repo's progressive decoder was validated only
 * against the repo's own encoder — a shared T.81 misreading would
 * pass. These fixtures come from libjpeg itself (jpeg_simple_progression
 * scan script, optimized Huffman), so the decoder is checked against
 * the reference implementation's bitstream. Baseline and progressive
 * encodings of the SAME image share the quantized coefficient tensor,
 * so the repo decoder must emit BIT-IDENTICAL luma for both files;
 * libjpeg's own decoded luma is committed alongside as a tolerance
 * cross-check (IDCT rounding differs by implementation).
 *
 * Build + run (libjpeg-dev + gcc, present in the build container):
 *   gcc gen_progressive_fixture.c -ljpeg -o genfix && ./genfix
 */
#include <stdio.h>
#include <stdlib.h>
#include <jpeglib.h>

#define W 48
#define H 32

static void fill(unsigned char *buf) {
    for (int y = 0; y < H; y++)
        for (int x = 0; x < W; x++)
            buf[y * W + x] =
                (unsigned char)((x * 7 + y * 13 + ((x * y) % 31) * 5) % 256);
}

static void encode(const char *path, int progressive, unsigned char *img) {
    struct jpeg_compress_struct c;
    struct jpeg_error_mgr e;
    c.err = jpeg_std_error(&e);
    jpeg_create_compress(&c);
    FILE *f = fopen(path, "wb");
    jpeg_stdio_dest(&c, f);
    c.image_width = W;
    c.image_height = H;
    c.input_components = 1;
    c.in_color_space = JCS_GRAYSCALE;
    jpeg_set_defaults(&c);
    jpeg_set_quality(&c, 85, TRUE);
    c.optimize_coding = TRUE;
    if (progressive)
        jpeg_simple_progression(&c);
    jpeg_start_compress(&c, TRUE);
    while (c.next_scanline < c.image_height) {
        JSAMPROW row = img + c.next_scanline * W;
        jpeg_write_scanlines(&c, &row, 1);
    }
    jpeg_finish_compress(&c);
    fclose(f);
    jpeg_destroy_compress(&c);
}

static void decode_dump(const char *jpath, const char *out) {
    struct jpeg_decompress_struct d;
    struct jpeg_error_mgr e;
    d.err = jpeg_std_error(&e);
    jpeg_create_decompress(&d);
    FILE *f = fopen(jpath, "rb");
    jpeg_stdio_src(&d, f);
    jpeg_read_header(&d, TRUE);
    d.out_color_space = JCS_GRAYSCALE;
    jpeg_start_decompress(&d);
    unsigned char *buf = malloc(d.output_width * d.output_height);
    while (d.output_scanline < d.output_height) {
        JSAMPROW row = buf + d.output_scanline * d.output_width;
        jpeg_read_scanlines(&d, &row, 1);
    }
    jpeg_finish_decompress(&d);
    fclose(f);
    jpeg_destroy_decompress(&d);
    FILE *o = fopen(out, "wb");
    fwrite(buf, 1, W * H, o);
    fclose(o);
    free(buf);
}

int main(void) {
    unsigned char img[W * H];
    fill(img);
    encode("libjpeg_baseline.jpg", 0, img);
    encode("libjpeg_progressive.jpg", 1, img);
    decode_dump("libjpeg_baseline.jpg", "libjpeg_baseline_luma.raw");
    decode_dump("libjpeg_progressive.jpg", "libjpeg_progressive_luma.raw");
    return 0;
}
