package javaref;

import java.io.BufferedReader;
import java.io.InputStreamReader;

import edu.cmu.lti.lexical_db.NictWordNet;
import edu.cmu.lti.ws4j.impl.Lin;

/**
 * Property-check oracle for erex/wnlin.py: reads "w1 TAB w2" pairs from
 * stdin and prints the Lin score's IEEE-754 bit pattern (hex of
 * doubleToLongBits), one per line, so the Python side can assert
 * BIT-exact cross-runtime equality of the shared Lin implementation.
 */
public class LinCheck {
    public static void main(String[] args) throws Exception {
        Lin lin = new Lin(new NictWordNet());
        BufferedReader r = new BufferedReader(
                new InputStreamReader(System.in));
        StringBuilder out = new StringBuilder();
        String line;
        while ((line = r.readLine()) != null) {
            if (line.isEmpty()) continue;
            String[] c = line.split("\t");
            double v = lin.calcRelatednessOfWords(c[0], c[1]);
            out.append(Long.toHexString(Double.doubleToLongBits(v)))
               .append('\n');
        }
        System.out.print(out);
    }
}
